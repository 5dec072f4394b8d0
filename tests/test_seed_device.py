"""Device-side seeding (ops/seed_device.py): index probe + anchor
construction + sort fused with chaining on device, byte-identical to the
host-seeded batch path (SURVEY §7 step 3; reference map.c:90-247)."""
import io as _io
import sys
import tempfile
from contextlib import redirect_stdout

import numpy as np
import pytest

from mm2tpu.cli import main as cli_main

T = "/root/reference/test"


def _run(args):
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(args)
    assert rc == 0
    return buf.getvalue()


def test_device_seed_parity_mt():
    host = _run(["-x", "map-ont", "-c", "--map-mode", "batch",
                 f"{T}/MT-orang.fa", f"{T}/MT-human.fa"])
    dev = _run(["-x", "map-ont", "-c", "--map-mode", "batch",
                "--seed-backend", "tpu",
                f"{T}/MT-orang.fa", f"{T}/MT-human.fa"])
    assert dev == host


def test_device_seed_parity_randomized():
    sys.path.insert(0, "scripts")
    import fuzz_diff as fd
    rng = np.random.default_rng(3)
    with tempfile.TemporaryDirectory() as tmp:
        ref, reads = fd.gen_case(rng, tmp)
        host = _run(["-x", "map-ont", "-c", "--map-mode", "batch",
                     ref, reads])
        dev = _run(["-x", "map-ont", "-c", "--map-mode", "batch",
                    "--seed-backend", "tpu", ref, reads])
        assert dev == host


def test_device_seed_units():
    """split/reassemble helpers round-trip anchor encodings exactly."""
    from mm2tpu.ops.seed_device import anchors_from_device
    rng = np.random.default_rng(0)
    n = 257
    rid = rng.integers(0, 1000, n).astype(np.int64)
    rev = rng.integers(0, 2, n).astype(np.int64)
    rpos = rng.integers(0, 1 << 30, n).astype(np.int64)
    span = rng.integers(10, 200, n).astype(np.int64)
    tand = rng.integers(0, 2, n).astype(np.int64)
    ypos = rng.integers(0, 1 << 30, n).astype(np.int64)
    x = (rev.astype(np.uint64) << np.uint64(63)) | \
        (rid.astype(np.uint64) << np.uint64(32)) | rpos.astype(np.uint64)
    y = (tand.astype(np.uint64) << np.uint64(42)) | \
        (span.astype(np.uint64) << np.uint64(32)) | ypos.astype(np.uint64)
    xhi = np.where(rev == 1, rid | -0x80000000, rid).astype(np.int32)
    xhi_flip = (xhi ^ np.int32(-0x80000000)).astype(np.int32)
    yhi = (span | (tand << 10)).astype(np.int32)
    a = anchors_from_device(xhi_flip, rpos.astype(np.int32), yhi,
                            ypos.astype(np.int32), n)
    np.testing.assert_array_equal(a[:, 0], x)
    np.testing.assert_array_equal(a[:, 1], y)


def test_device_seed_parity_asm20_fuzz(tmp_path):
    """asm20 regime (k=19 w=10 minimizers, dense near-identical tasks)
    through the batch and device-seed paths — the second trained-router
    regime (chain_hardware.h:24-30) must keep byte parity there too."""
    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    genome = "".join(bases[rng.integers(0, 4, 120_000)])
    ref = tmp_path / "ref.fa"
    ref.write_text(f">c0\n{genome}\n")
    reads = tmp_path / "contigs.fa"
    with open(reads, "w") as f:
        for i in range(4):
            st = int(rng.integers(0, 60_000))
            ln = int(rng.integers(15_000, 30_000))
            s = np.array(list(genome[st:st + ln]))
            # ~2% divergence: the asm20 design point
            mut = rng.random(len(s)) < 0.02
            s[mut] = bases[rng.integers(0, 4, int(mut.sum()))]
            f.write(f">ctg{i}\n{''.join(s)}\n")
    base = ["-x", "asm20", "-c", "--map-mode", "batch"]
    tail = [str(ref), str(reads)]
    host = _run(base + tail)
    plain = _run(["-x", "asm20", "-c"] + tail)
    assert host == plain
    dev = _run(base + ["--seed-backend", "tpu"] + tail)
    assert dev == host


def test_router_regime_selection():
    """Per-preset trained-constant selection (chain_hardware.h:18-30's
    two sets): asm-class presets resolve to the asm regime file."""
    from mm2tpu.mapping.costmodel import regime_for_preset
    assert regime_for_preset("asm20") == "asm"
    assert regime_for_preset("asm5") == "asm"
    assert regime_for_preset("map-ont") == "map"
    assert regime_for_preset(None) == "map"
    from mm2tpu.options import set_opt
    _, mo = set_opt("asm20")
    assert mo.preset == "asm20"
    _, mo = set_opt("map-ont")
    assert mo.preset == "map-ont"


@pytest.mark.parametrize("flagset", [["-r", "500"], ["-H"]])
def test_device_seed_parity_flag_variants(flagset, tmp_path):
    seq = "".join(l.strip() for l in
                  open(f"{T}/MT-human.fa").read().splitlines()[1:])
    reads = tmp_path / "r.fa"
    with open(reads, "w") as f:
        for i in range(6):
            st = (i * 997) % (len(seq) - 2500)
            f.write(f">r{i}\n{seq[st:st + 2200]}\n")
    base = ["-x", "map-ont", "-c", "--map-mode", "batch"] + flagset
    tail = [f"{T}/MT-orang.fa", str(reads)]
    host = _run(base + tail)
    dev = _run(base + ["--seed-backend", "tpu"] + tail)
    assert dev == host
