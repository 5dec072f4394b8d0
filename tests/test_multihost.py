"""Multi-host scale-out: two real processes rendezvous via
jax.distributed, stripe the input, and host 0's ordered merge is
byte-identical to a single-host run (SURVEY §5 'Distributed communication
backend'; the cross-host generalization of the --split-prefix merge,
reference map.c:469-524,671-714)."""
import pathlib
import socket
import subprocess
import sys

REPO = str(pathlib.Path(__file__).resolve().parent.parent)
T = "/root/reference/test"


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _make_reads(tmp_path, n=30):
    seq = "".join(l.strip() for l in
                  open(f"{T}/MT-human.fa").read().splitlines()[1:])
    reads = tmp_path / "reads.fa"
    with open(reads, "w") as f:
        for i in range(n):
            st = (i * 379) % (len(seq) - 2300)
            f.write(f">r{i}\n{seq[st:st + 2000 + (i % 7) * 40]}\n")
    return reads


def _run_host(args, env_extra=None):
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    # this box's PYTHONPATH injects a hardware-plugin sitecustomize that
    # overrides JAX_PLATFORMS and blocks on an unreachable accelerator;
    # the multi-host coordination path must stay CPU-pure
    env["PYTHONPATH"] = ""
    if env_extra:
        env.update(env_extra)
    return subprocess.Popen([sys.executable, "-m", "mm2tpu.cli"] + args,
                            cwd=REPO, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def test_two_host_merge_byte_identical(tmp_path):
    reads = _make_reads(tmp_path)
    single = tmp_path / "single.paf"
    merged = tmp_path / "merged.paf"
    base = ["-x", "map-ont", "-c", "-t", "1", f"{T}/MT-orang.fa",
            str(reads)]

    r = _run_host(base + ["-o", str(single)])
    assert r.wait(timeout=300) == 0, r.stderr.read()[-2000:]

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    hosts = [_run_host(base + ["-o", str(merged), "--hosts", "2",
                               "--host-id", str(h), "--coordinator", coord])
             for h in range(2)]
    for h, p in enumerate(hosts):
        assert p.wait(timeout=300) == 0, (h, p.stderr.read()[-2000:])

    assert merged.read_bytes() == single.read_bytes()
    # stripe parts are cleaned up after the merge
    assert not list(tmp_path.glob("*.part"))


def test_two_host_merge_sam(tmp_path):
    """SAM mode: header from host 0 only, records interleaved in order."""
    reads = _make_reads(tmp_path, n=11)
    single = tmp_path / "single.sam"
    merged = tmp_path / "merged.sam"
    base = ["-x", "map-ont", "-a", "-t", "1", f"{T}/MT-orang.fa",
            str(reads)]
    r = _run_host(base + ["-o", str(single)])
    assert r.wait(timeout=300) == 0, r.stderr.read()[-2000:]
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    hosts = [_run_host(base + ["-o", str(merged), "--hosts", "2",
                               "--host-id", str(h), "--coordinator", coord])
             for h in range(2)]
    for h, p in enumerate(hosts):
        assert p.wait(timeout=300) == 0, (h, p.stderr.read()[-2000:])

    def strip_pg(path):
        return [l for l in path.read_text().splitlines()
                if not l.startswith("@PG")]

    assert strip_pg(merged) == strip_pg(single)


def test_multihost_flag_validation(tmp_path):
    from mm2tpu.cli import main as cli_main
    # --hosts without -o
    rc = cli_main(["-x", "map-ont", "--hosts", "2", "--host-id", "0",
                   "--coordinator", "127.0.0.1:1", f"{T}/MT-orang.fa",
                   f"{T}/MT-human.fa"])
    assert rc == 1
    # --hosts without --coordinator
    rc = cli_main(["-x", "map-ont", "--hosts", "2", "--host-id", "0",
                   "-o", str(tmp_path / "x.paf"), f"{T}/MT-orang.fa",
                   f"{T}/MT-human.fa"])
    assert rc == 1


def test_three_host_merge_uneven(tmp_path):
    """3 processes, 151 reads (151 % 3 == 1: uneven stripes, the tail
    host finishes a record short) — merged output byte-identical to a
    single-host run. Exercises the round-robin merge's exhausted-reader
    path (parallel/multihost.py::merge_parts) beyond the N=2 case."""
    reads = _make_reads(tmp_path, n=151)
    single = tmp_path / "single.paf"
    merged = tmp_path / "merged.paf"
    base = ["-x", "map-ont", "-t", "1", f"{T}/MT-orang.fa", str(reads)]

    r = _run_host(base + ["-o", str(single)])
    assert r.wait(timeout=600) == 0, r.stderr.read()[-2000:]

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    hosts = [_run_host(base + ["-o", str(merged), "--hosts", "3",
                               "--host-id", str(h), "--coordinator", coord])
             for h in range(3)]
    for h, p in enumerate(hosts):
        assert p.wait(timeout=600) == 0, (h, p.stderr.read()[-2000:])

    assert merged.read_bytes() == single.read_bytes()
    assert not list(tmp_path.glob("*.part"))


def test_multihost_with_device_mesh(tmp_path):
    """Multi-host x multi-chip composition: each of 2 host processes
    drives its OWN 2-device virtual mesh (--mesh 2, batched sharded
    chaining) — the pod-slice topology (one process per host, local
    chips via shard_map, cross-host via jax.distributed striping).
    Merged output must be byte-identical to a plain single-host,
    non-mesh run."""
    reads = _make_reads(tmp_path, n=16)
    single = tmp_path / "single.paf"
    merged = tmp_path / "merged.paf"
    tail = ["-x", "map-ont", "-c", "-t", "1", f"{T}/MT-orang.fa",
            str(reads)]

    r = _run_host(tail + ["-o", str(single)])
    assert r.wait(timeout=600) == 0, r.stderr.read()[-2000:]

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    mesh_env = {"XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    hosts = [_run_host(["--mesh", "2", "--hosts", "2", "--host-id",
                        str(h), "--coordinator", coord,
                        "-o", str(merged)] + tail, env_extra=mesh_env)
             for h in range(2)]
    for h, p in enumerate(hosts):
        assert p.wait(timeout=600) == 0, (h, p.stderr.read()[-2000:])
    assert merged.read_bytes() == single.read_bytes()


def test_host_death_fails_all(tmp_path):
    """Failure mode: one of three hosts is stopped/killed -> every
    survivor exits nonzero within --host-timeout (rendezvous timeout if
    the victim died pre-connect, map_done barrier timeout otherwise) and
    the merged output is never left behind — a partial result can't
    pass for a complete one."""
    import signal
    import time
    reads = _make_reads(tmp_path, n=12)
    merged = tmp_path / "merged.paf"
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    hosts = [_run_host(["-x", "map-ont", "-t", "1", "--hosts", "3",
                        "--host-timeout", "25", "--host-id", str(h),
                        "--coordinator", coord, "-o", str(merged),
                        f"{T}/MT-orang.fa", str(reads)])
             for h in range(3)]
    # freeze host 2 right after spawn: on a fast box the whole tiny job
    # can finish in <5 s, so a late freeze raced the success path (the
    # flake this replaces); an early freeze pins the victim pre-connect
    # or in early startup, and survivors must then hit a timeout either
    # at rendezvous or at the map_done barrier
    time.sleep(0.5)
    hosts[2].send_signal(signal.SIGSTOP)
    rcs = [hosts[h].wait(timeout=180) for h in range(2)]
    hosts[2].kill()
    hosts[2].wait(timeout=30)
    assert all(rc != 0 for rc in rcs), \
        [hosts[h].stderr.read()[-1000:] for h in range(2)]
    assert not merged.exists(), "partial merged output left behind"
