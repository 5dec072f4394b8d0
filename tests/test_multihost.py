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
