// Standalone self-test for the native batching runtime (the reference's
// C++ unit-test tier, C/tests/CMakeLists.txt:38-50, without the gtest
// dependency).  Exercises the C API exactly as ctypes does.
// Build+run is driven by tests/test_native_runtime.py::test_cpp_self_test.

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
void* ewt_kv_create(int, int, int, int);
void ewt_kv_destroy(void*);
int ewt_kv_add_sequence(void*, int, int);
int ewt_kv_step(void*, const uint8_t*);
int ewt_kv_stop(void*, int);
int ewt_kv_num_sequences(void*);
int ewt_kv_free_blocks(void*);
void ewt_kv_block_table(void*, int32_t*);

void* ewt_sched_create(int, int, int);
void ewt_sched_destroy(void*);
void ewt_sched_add_request(void*, int64_t, int, int, uint8_t);
int ewt_sched_next_admission(void*, int64_t*);
void ewt_sched_on_admitted(void*, int, int);
int ewt_sched_push_token(void*, int, int);
int ewt_sched_num_pending(void*);
int ewt_sched_num_active(void*);
void ewt_sched_state(void*, uint8_t*, int32_t*, int32_t*);
}

static void test_block_manager() {
  // pool: 8 blocks of 4 tokens, 2 beams, table width 4
  void* kv = ewt_kv_create(8, 4, 4, 2);
  assert(ewt_kv_free_blocks(kv) == 8);
  // 6-token context -> 1 FULL block shared across beams + the PARTIAL
  // last block private per beam from the start (generation tokens land in
  // it at every beam's own row): 3 blocks used
  assert(ewt_kv_add_sequence(kv, 0, 6) == 0);
  assert(ewt_kv_free_blocks(kv) == 5);
  std::vector<int32_t> table(1 * 2 * 4);
  ewt_kv_block_table(kv, table.data());
  assert(table[0] == table[4]);          // full prompt block shared
  assert(table[1] != table[5]);          // partial block private per beam
  // steps at len 6, 7 (mid-block): partial already private -> no-op
  uint8_t fin0 = 0;
  assert(ewt_kv_step(kv, &fin0) == 0);   // len 7
  assert(ewt_kv_free_blocks(kv) == 5);
  assert(ewt_kv_step(kv, &fin0) == 0);   // len 8
  assert(ewt_kv_step(kv, &fin0) == 0);   // len 9 (crossed: +2 private)
  assert(ewt_kv_free_blocks(kv) == 3);
  // free everything
  assert(ewt_kv_stop(kv, 0) == 0);
  assert(ewt_kv_free_blocks(kv) == 8);
  assert(ewt_kv_num_sequences(kv) == 0);
  // pool exhaustion reported, not crashed
  assert(ewt_kv_add_sequence(kv, 1, 100) == -1);
  ewt_kv_destroy(kv);
  std::printf("block manager OK\n");
}

static void test_scheduler() {
  void* s = ewt_sched_create(2, 16, /*end_id=*/9);
  ewt_sched_add_request(s, 100, 3, -1, 0);
  ewt_sched_add_request(s, 101, 50, 7, 1);
  ewt_sched_add_request(s, 102, 5, -1, 0);
  assert(ewt_sched_num_pending(s) == 3);
  int64_t rid;
  int s0 = ewt_sched_next_admission(s, &rid);
  assert(s0 == 0 && rid == 100);
  ewt_sched_on_admitted(s, s0, 4);
  int s1 = ewt_sched_next_admission(s, &rid);
  assert(s1 == 1 && rid == 101);
  ewt_sched_on_admitted(s, s1, 2);
  // no free slot for 102
  assert(ewt_sched_next_admission(s, &rid) == -1);
  assert(ewt_sched_num_pending(s) == 1);
  // slot 0: budget 3 -> finishes on third token
  assert(ewt_sched_push_token(s, s0, 1) == 0);
  assert(ewt_sched_push_token(s, s0, 2) == 0);
  assert(ewt_sched_push_token(s, s0, 3) & 1);
  // slot 1: streaming chunks until custom end id 7
  assert(ewt_sched_push_token(s, s1, 1) == 2);
  assert(ewt_sched_push_token(s, s1, 7) & 1);
  // both free -> 102 admitted into slot 0 (first free)
  int s2 = ewt_sched_next_admission(s, &rid);
  assert(s2 == 0 && rid == 102);
  ewt_sched_on_admitted(s, s2, 14);
  // max-seq-len stop: len 15 == 16-1
  assert(ewt_sched_push_token(s, s2, 1) & 1);
  uint8_t active[2];
  int32_t lens[2], last[2];
  ewt_sched_state(s, active, lens, last);
  assert(!active[0] && !active[1]);
  ewt_sched_destroy(s);
  std::printf("scheduler OK\n");
}

int main() {
  test_block_manager();
  test_scheduler();
  std::printf("ALL NATIVE TESTS PASSED\n");
  return 0;
}
