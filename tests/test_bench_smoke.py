"""The driver-facing bench script must always run: exercise it end-to-end
with a tiny model on CPU and validate its one-line JSON contract."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_script_json_contract():
    # pin the cpu platform (never dial the TPU relay from tests — only
    # BENCH_DEVICE's in-python jax.config pin reliably prevents a wedged
    # relay from hanging discovery) and the bf16 recipe: the quantized
    # default drags the Pallas decode kernels through interpret mode on
    # CPU, which once blew a 900 s budget
    env = dict(os.environ, BENCH_MODEL="tiny", BENCH_ITERS="1",
               BENCH_QUANT="bf16", BENCH_DEVICE="cpu")
    code = "import bench; bench.DECODE_TOKENS = 4; bench.main()"
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["unit"] == "utt/s" and rec["value"] > 0
