"""Native (C++) runtime components, loaded via ctypes.

The reference's native layer is CUDA plugins + a C++ session; the TPU
compute path needs none of that (XLA/Pallas own the device), so the native
code here is host-side runtime: the FLAC audio decoder (replacing the
ffmpeg subprocess) and the batching runtime (paged-KV block bookkeeping +
continuous-batching slot scheduler, the layer the reference ships as
libtensorrt_llm_batch_manager_static.a).

Libraries are built on demand with g++ -O2 into this directory; rebuilds
happen only when the source is newer than the .so.
"""
from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(__file__)


def _build(name: str, srcs) -> str:
    so_path = os.path.join(_DIR, f"lib{name}.so")
    src_paths = [os.path.join(_DIR, s) for s in srcs]
    if (not os.path.exists(so_path)
            or any(os.path.getmtime(s) > os.path.getmtime(so_path)
                   for s in src_paths)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               "-o", so_path, *src_paths]
        subprocess.run(cmd, check=True, capture_output=True)
    return so_path


def flac_library_path() -> str:
    return _build("ewtflac", ["flac_decoder.cc"])
