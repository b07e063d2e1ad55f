"""Native (C++) runtime components, loaded via ctypes.

The reference's native layer is CUDA plugins + a C++ session; the TPU
compute path needs none of that (XLA/Pallas own the device), so the native
code here is host-side runtime: the FLAC audio decoder (replacing the
ffmpeg subprocess) and the batching runtime (paged-KV block bookkeeping +
continuous-batching slot scheduler, the layer the reference ships as
libtensorrt_llm_batch_manager_static.a).

Libraries are always built from source (never committed): a sha256 of the
sources is stored next to the .so and the library is rebuilt whenever it
is missing or the recorded hash doesn't match — so a stale or foreign
binary is never loaded in place of the reviewed source.
"""
from __future__ import annotations

import hashlib
import os
import subprocess

_DIR = os.path.dirname(__file__)


def _src_digest(src_paths) -> str:
    h = hashlib.sha256()
    for p in src_paths:
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _build(name: str, srcs) -> str:
    so_path = os.path.join(_DIR, f"lib{name}.so")
    stamp_path = so_path + ".sha256"
    src_paths = [os.path.join(_DIR, s) for s in srcs]
    digest = _src_digest(src_paths)
    stamp = None
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            stamp = f.read().strip()
    if not os.path.exists(so_path) or stamp != digest:
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               "-o", so_path, *src_paths]
        subprocess.run(cmd, check=True, capture_output=True)
        with open(stamp_path, "w") as f:
            f.write(digest)
    return so_path


def flac_library_path() -> str:
    return _build("ewtflac", ["flac_decoder.cc"])
