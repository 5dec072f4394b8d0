"""On-device (real TPU) differential tests.

The regular suite runs every kernel in interpret mode on a virtual CPU mesh
(tests/conftest.py forces JAX_PLATFORMS=cpu). This module re-runs the
kernel-vs-oracle differentials COMPILED on the real chip — the Mosaic
compile path can diverge from the interpreter, so this is the final word on
bit-exactness (the reference's VERIFY_OUTPUT idea, chain.c:58-89, applied
to hardware).

Opt-in: set MM2TPU_DEVICE_TESTS=1 (spawns subprocesses without the CPU
forcing; each compiles on the attached TPU, ~minutes).
"""
import os
import pathlib
import subprocess
import sys

import pytest

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

pytestmark = pytest.mark.skipif(
    os.environ.get("MM2TPU_DEVICE_TESTS") != "1",
    reason="set MM2TPU_DEVICE_TESTS=1 to run on-device kernel tests")


def run_snippet(code: str) -> str:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


CHAIN_SNIPPET = r"""
import sys; sys.path.insert(0, ".")
import numpy as np, jax
assert jax.default_backend() == "tpu", jax.default_backend()
from mm2tpu.ops.chain_pallas_v2 import chain_scores_tpu_v2
from mm2tpu.ops import chain_ref
rng = np.random.default_rng(42)
for n, density in [(1024, 0.2), (4096, 1.0), (3000, 0.5), (12288, 4.0)]:
    # the last case crosses the 8192-anchor routing threshold with dense
    # saturated windows: the bounded-lookback regime the static router
    # sends to the device (chain.c:66-68's documented HW divergence)
    lo = np.sort(rng.integers(0, int(n/density), n)).astype(np.uint64)
    qi = np.clip(lo.astype(np.int64)+rng.integers(-400,400,n),0,None).astype(np.uint64)
    a = np.zeros((n,2), np.uint64); a[:,0] = lo
    a[:,1] = (np.uint64(15)<<np.uint64(32)) | qi
    f1,p1,v1 = chain_scores_tpu_v2(a,5000,5000,500,5000,1.0,False,1,interpret=False)
    f2,p2,v2 = chain_ref.chain_scores_exact(a,5000,5000,500,0x7fffffff,1024,1.0,False,1)
    assert np.array_equal(f1,f2) and np.array_equal(p1,p2) and np.array_equal(v1,v2), n
print("CHAIN_DEVICE_OK")
"""

KSW2_SNIPPET = r"""
import sys; sys.path.insert(0, ".")
import numpy as np, jax
assert jax.default_backend() == "tpu", jax.default_backend()
from mm2tpu.ops import ksw2_ref as K
from mm2tpu.ops.ksw2_pallas import extd2_batch
MAT = K.gen_simple_mat(2, 4, 1)
FIELDS = ("max","zdropped","max_q","max_t","mqe","mqe_t","mte","mte_q",
          "score","reach_end","cigar")
rng = np.random.default_rng(0)
def mutate(seq):
    out=[]
    for c in seq:
        r=rng.random()
        if r<0.1: out.append(rng.integers(0,4))
        elif r<0.125: continue
        elif r<0.15: out.append(int(c)); out.append(rng.integers(0,4))
        else: out.append(int(c))
    return np.array(out,dtype=np.uint8)
tasks=[]
for i in range(4):
    t8=rng.integers(0,4,int(rng.integers(100,800))).astype(np.uint8)
    tasks.append((mutate(t8),t8))
res=extd2_batch(tasks,MAT,q=4,e=2,q2=24,e2=1,w=151,zdrop=400,end_bonus=-1,
                flag=0,interpret=False)
for i,(q8,t8) in enumerate(tasks):
    exp=K.ksw_extd2(len(q8),q8,len(t8),t8,MAT,4,2,24,1,151,400,-1,0)
    for f in FIELDS:
        assert getattr(exp,f)==getattr(res[i],f), (i,f)
print("KSW2_DEVICE_OK")
"""


EXTS2_SNIPPET = r"""
import sys; sys.path.insert(0, ".")
import numpy as np, jax
assert jax.default_backend() == "tpu", jax.default_backend()
from mm2tpu.ops import ksw2_ref as K
from mm2tpu.ops.ksw2_pallas import exts2_batch
from mm2tpu.ops.ksw2_splice_ref import ksw_exts2
MAT = K.gen_simple_mat(2, 4, 1)
FIELDS = ("max","zdropped","max_q","max_t","mqe","mqe_t","mte","mte_q",
          "score","reach_end","cigar")
rng = np.random.default_rng(0)
tasks=[]
for _ in range(3):
    e1=rng.integers(0,4,120).astype(np.uint8)
    e2=rng.integers(0,4,120).astype(np.uint8)
    intr=rng.integers(0,4,200).astype(np.uint8)
    intr[0],intr[1]=2,3; intr[-2],intr[-1]=0,2
    tasks.append((np.concatenate([e1,e2]), np.concatenate([e1,intr,e2])))
res=exts2_batch(tasks,MAT,q=4,e=2,q2=32,noncan=9,zdrop=200,junc_bonus=9,
                flag=K.KSW_EZ_SPLICE_FOR,interpret=False)
for i,(q8,t8) in enumerate(tasks):
    exp=ksw_exts2(len(q8),q8,len(t8),t8,MAT,4,2,32,9,200,9,
                  K.KSW_EZ_SPLICE_FOR)
    for f in FIELDS:
        assert getattr(exp,f)==getattr(res[i],f), (i,f)
print("EXTS2_DEVICE_OK")
"""


def test_chain_kernel_on_device():
    assert "CHAIN_DEVICE_OK" in run_snippet(CHAIN_SNIPPET)


def test_ksw2_kernel_on_device():
    assert "KSW2_DEVICE_OK" in run_snippet(KSW2_SNIPPET)


def test_exts2_kernel_on_device():
    assert "EXTS2_DEVICE_OK" in run_snippet(EXTS2_SNIPPET)


def _run_cli_device(args: str) -> str:
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    r = subprocess.run([sys.executable, "-m", "mm2tpu.cli"] + args.split(),
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_cli_chain_backend_tpu_e2e():
    """Full CLI run with the compiled chaining kernel on the real chip:
    byte-identical PAF vs the reference golden."""
    out = _run_cli_device(
        "--chain-backend tpu -x map-ont -c "
        "/root/reference/test/MT-orang.fa /root/reference/test/MT-human.fa")
    golden = (pathlib.Path(REPO) / "tests/golden/mapont_MT_c.paf").read_text()
    assert out == golden


def test_cli_align_backend_tpu_e2e():
    """Full CLI run routing DP fills to the compiled ksw2 kernel on the
    real chip: byte-identical SAM vs the reference golden."""
    out = _run_cli_device(
        "--align-backend tpu --align-tpu-min-mat 10000 -ax map-ont "
        "/root/reference/test/MT-orang.fa /root/reference/test/MT-human.fa")
    strip = "\n".join(l for l in out.splitlines() if not l.startswith("@PG"))
    golden = (pathlib.Path(REPO) / "tests/golden/mapont_MT_a.sam").read_text()
    gstrip = "\n".join(l for l in golden.splitlines()
                       if not l.startswith("@PG"))
    assert strip == gstrip


def test_cli_seed_backend_tpu_e2e():
    """Device-seeded batch path compiled on the real chip: probe + anchor
    construction + sort + chaining fused on-device, byte-identical."""
    out = _run_cli_device(
        "-x map-ont -c --map-mode batch --seed-backend tpu "
        "/root/reference/test/MT-orang.fa /root/reference/test/MT-human.fa")
    golden = open(pathlib.Path(REPO) / "tests/golden/mapont_MT_c.paf").read()
    assert out == golden
