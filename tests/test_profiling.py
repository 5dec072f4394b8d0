"""--profile / --profile-trace: the per-stage timing struct + jax.profiler
trace (SURVEY.md §5 tracing; the MEASURE_* macros' TPU equivalent,
reference chain_hardware.h:39-45)."""
import io as _io
import sys
from contextlib import redirect_stdout

import pytest

from mm2tpu.cli import main as cli_main
from mm2tpu.utils import profiling

T = "/root/reference/test"


def _run(args, capsys):
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main(args.split())
    assert rc == 0
    return buf.getvalue(), capsys.readouterr().err


def test_profile_stage_table(ref_test_dir, golden_dir, capsys):
    out, err = _run(f"-x map-ont -c --profile {T}/MT-orang.fa "
                    f"{T}/MT-human.fa", capsys)
    # output parity is unaffected by profiling
    assert out == (golden_dir / "mapont_MT_c.paf").read_text()
    for name in ("seed", "chain", "align", "emit", "post", "index"):
        assert any(line.startswith("[PROF] %s" % name)
                   for line in err.splitlines()), name
    profiling.disable()


def test_profile_batch_mode_device_stages(ref_test_dir, capsys):
    _, err = _run(f"-x map-ont --map-mode batch --profile "
                  f"{T}/MT-orang.fa {T}/MT-human.fa", capsys)
    assert "[PROF] chain.device" in err
    assert "[PROF] chain.backtrack" in err
    profiling.disable()


def test_profile_trace_writes_xplane(ref_test_dir, tmp_path, capsys):
    tdir = tmp_path / "trace"
    _, err = _run(f"-x map-ont -c --profile-trace {tdir} "
                  f"{T}/MT-orang.fa {T}/MT-human.fa", capsys)
    assert "[PROF]" in err
    files = list(tdir.rglob("*.xplane.pb"))
    assert files, "no xplane protobuf written under %s" % tdir
    profiling.disable()


def test_stage_accumulator_disabled_is_noop():
    profiling.disable()
    profiling.reset()
    with profiling.stage("x"):
        pass
    assert profiling.snapshot() == {}
