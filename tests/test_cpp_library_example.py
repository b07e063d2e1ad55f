"""examples/cpp_library: the native runtime driven from standalone C++
through its extern-C API (reference analogue: E/cpp_library/main.cpp
dlopening the TRT-LLM plugin library)."""
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cpp_library_example_builds_and_runs(tmp_path):
    d = os.path.join(REPO, "examples", "cpp_library")
    lib = os.path.join(tmp_path, "libewtruntime.so")
    exe = os.path.join(tmp_path, "example")
    native = os.path.join(REPO, "eddie_wang_hackathon2023_tpu", "native",
                          "batch_runtime.cc")
    subprocess.run(["g++", "-O2", "-fPIC", "-shared", "-o", lib, native],
                   check=True)
    subprocess.run(["g++", "-O2", "-o", exe,
                    os.path.join(d, "main.cpp"), "-ldl"], check=True)
    out = subprocess.run([exe, lib], check=True, capture_output=True,
                         text=True).stdout
    assert "cpp_library example OK" in out
    assert "all 32 blocks returned" in out
