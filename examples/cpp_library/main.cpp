// Using the native runtime as a C++ library (the cpp_library example,
// TPU-native): dlopen libewtruntime.so and drive the continuous-batching
// scheduler + paged KV block manager through the exported C API — the
// same surface the Python framework binds via ctypes
// (eddie_wang_hackathon2023_tpu/native/__init__.py).
// Reference analogue: E/cpp_library/main.cpp dlopens the TRT-LLM plugin
// library and resolves its entry points through getTrtLlmFunction.
#include <dlfcn.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

template <typename Sig>
Sig resolve(void* lib, const char* name) {
  void* sym = dlsym(lib, name);
  if (!sym) {
    std::fprintf(stderr, "missing symbol %s: %s\n", name, dlerror());
    std::exit(1);
  }
  return reinterpret_cast<Sig>(sym);
}

int main(int argc, char** argv) {
  const char* path = argc > 1 ? argv[1] : "libewtruntime.so";
  void* lib = dlopen(path, RTLD_NOW);
  if (!lib) {
    std::fprintf(stderr, "dlopen(%s) failed: %s\n", path, dlerror());
    return 1;
  }

  // ---- scheduler: admit 4 requests into 2 slots, decode to completion
  auto sched_create = resolve<void* (*)(int, int, int)>(lib, "ewt_sched_create");
  auto sched_destroy = resolve<void (*)(void*)>(lib, "ewt_sched_destroy");
  auto sched_add = resolve<void (*)(void*, int64_t, int, int, uint8_t)>(
      lib, "ewt_sched_add_request");
  auto sched_next = resolve<int (*)(void*, int64_t*)>(
      lib, "ewt_sched_next_admission");
  auto sched_on_admitted = resolve<void (*)(void*, int, int)>(
      lib, "ewt_sched_on_admitted");
  auto sched_push = resolve<int (*)(void*, int, int)>(
      lib, "ewt_sched_push_token");
  auto sched_pending = resolve<int (*)(void*)>(lib, "ewt_sched_num_pending");
  auto sched_active = resolve<int (*)(void*)>(lib, "ewt_sched_num_active");

  const int kSlots = 2, kEndId = 99;
  void* sched = sched_create(kSlots, /*max_seq_len=*/64, kEndId);
  for (int64_t id = 0; id < 4; ++id)
    sched_add(sched, id, /*max_new_tokens=*/5, kEndId, /*streaming=*/0);

  int generated = 0, ticks = 0;
  while (sched_pending(sched) > 0 || sched_active(sched) > 0) {
    int64_t rid;
    int slot;
    while ((slot = sched_next(sched, &rid)) >= 0)
      sched_on_admitted(sched, slot, /*prompt_len=*/8);
    // one "model step": every active slot emits a token (42, never EOS,
    // so sequences finish by max_new_tokens)
    for (int s = 0; s < kSlots; ++s)
      if (sched_push(sched, s, 42) == 0) ++generated;
    ++ticks;
    if (ticks > 100) {
      std::fprintf(stderr, "scheduler did not drain\n");
      return 1;
    }
  }
  std::printf("scheduler: drained 4 requests through %d slots in %d ticks, "
              "%d tokens\n", kSlots, ticks, generated);
  sched_destroy(sched);

  // ---- paged KV: allocate, step, stop, verify blocks return to the pool
  auto kv_create = resolve<void* (*)(int, int, int, int)>(lib, "ewt_kv_create");
  auto kv_destroy = resolve<void (*)(void*)>(lib, "ewt_kv_destroy");
  auto kv_add = resolve<int (*)(void*, int, int)>(lib, "ewt_kv_add_sequence");
  auto kv_step = resolve<int (*)(void*, const uint8_t*)>(lib, "ewt_kv_step");
  auto kv_stop = resolve<int (*)(void*, int)>(lib, "ewt_kv_stop");
  auto kv_free = resolve<int (*)(void*)>(lib, "ewt_kv_free_blocks");

  void* kv = kv_create(/*num_blocks=*/32, /*tokens_per_block=*/8,
                       /*max_blocks_per_seq=*/8, /*beam_width=*/1);
  const int total_free = kv_free(kv);
  if (kv_add(kv, /*seq_id=*/0, /*context_len=*/20) != 0) return 1;
  if (kv_add(kv, /*seq_id=*/1, /*context_len=*/5) != 0) return 1;
  std::vector<uint8_t> fin(2, 0);
  for (int i = 0; i < 12; ++i)
    if (kv_step(kv, fin.data()) != 0) return 1;
  std::printf("paged KV: %d free blocks after 2 seqs x 12 steps (of %d)\n",
              kv_free(kv), total_free);
  kv_stop(kv, 0);
  kv_stop(kv, 1);
  if (kv_free(kv) != total_free) {
    std::fprintf(stderr, "block leak: %d != %d\n", kv_free(kv), total_free);
    return 1;
  }
  std::printf("paged KV: all %d blocks returned to the pool\n", total_free);
  kv_destroy(kv);
  std::puts("cpp_library example OK");
  return 0;
}
