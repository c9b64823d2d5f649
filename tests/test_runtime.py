"""Checkpoint/resume, GOP stitching, fault re-dispatch, and the
multi-process (2-proc CPU) distributed encode."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from ec504_imageencoder_tpu.models.decoder import decode_es
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.runtime.checkpoint import (
    CheckpointedEncode,
    encode_resumable,
)
from ec504_imageencoder_tpu.syntax import headers


@pytest.fixture(scope="module")
def frames(fixture_frames):
    base = np.stack([fixture_frames["0"], fixture_frames["1"], fixture_frames["2"]])
    return np.concatenate([base, base])[:, :96, :112]  # 6 frames, small


def _source(frames):
    return lambda start, end: frames[start:end]


def test_resumable_matches_single_shot(frames, tmp_path):
    enc = MPEG1IntraEncoder(quality=35, gop_size=2, backend="numpy")
    n = encode_resumable(
        _source(frames), len(frames), str(tmp_path / "wd"), str(tmp_path / "out.mpeg"),
        encoder=enc,
    )
    whole = enc.encode(frames) + headers.sequence_end()
    got = (tmp_path / "out.mpeg").read_bytes()
    assert n == len(got) == len(whole)
    assert got == whole
    assert len(decode_es(got)) == len(frames)


def test_resume_skips_completed_gops(frames, tmp_path):
    enc = MPEG1IntraEncoder(quality=35, gop_size=2, backend="numpy")
    sess = CheckpointedEncode(str(tmp_path / "wd"), enc, len(frames))
    # encode only GOP 0, then "crash"
    sess.encode_gop(0, frames[0:2])
    calls = []

    def source(start, end):
        calls.append((start, end))
        return frames[start:end]

    encode_resumable(
        source, len(frames), str(tmp_path / "wd"), str(tmp_path / "out.mpeg"),
        encoder=enc,
    )
    assert (0, 2) not in calls  # GOP 0 not re-encoded
    assert len(calls) == 2


def test_corrupt_segment_is_reencoded(frames, tmp_path):
    enc = MPEG1IntraEncoder(quality=35, gop_size=2, backend="numpy")
    sess = CheckpointedEncode(str(tmp_path / "wd"), enc, len(frames))
    rec = sess.encode_gop(0, frames[0:2])
    with open(rec.path, "r+b") as f:  # corrupt the segment bytes
        f.write(b"\xde\xad")
    sess2 = CheckpointedEncode(str(tmp_path / "wd"), enc, len(frames))
    assert 0 in [g for g in sess2.pending_gops()]


def test_transient_failure_redispatch(frames, tmp_path):
    enc = MPEG1IntraEncoder(quality=35, gop_size=3, backend="numpy")
    fail_once = {"left": 1}

    def flaky_source(start, end):
        if start == 3 and fail_once["left"]:
            fail_once["left"] -= 1
            raise IOError("simulated preemption")
        return frames[start:end]

    encode_resumable(
        flaky_source, len(frames), str(tmp_path / "wd"), str(tmp_path / "out.mpeg"),
        encoder=enc,
    )
    assert (tmp_path / "out.mpeg").exists()


_MULTIPROC_SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
pid, nproc, workdir, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
jax.distributed.initialize("127.0.0.1:{port}", num_processes=nproc, process_id=pid)
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.parallel.distributed import encode_multihost
rng = np.random.default_rng(0)  # same frames on every process
frames = rng.integers(0, 256, (4, 64, 80, 3), dtype=np.uint8)
enc = MPEG1IntraEncoder(quality=40, gop_size=1, backend="numpy")
n = encode_multihost(lambda s, e: frames[s:e], 4, workdir, out, encoder=enc)
print("RESULT", pid, n)
"""


def test_multiprocess_two_hosts(tmp_path):
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = _MULTIPROC_SCRIPT.replace("{port}", str(port)).format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    sp = str(tmp_path / "mp.py")
    with open(sp, "w") as f:
        f.write(script)
    wd, out = str(tmp_path / "wd"), str(tmp_path / "out.mpeg")
    procs = [
        subprocess.Popen(
            [sys.executable, sp, str(pid), "2", wd, out],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e.decode()[-2000:]
    # host 0 stitched a decodable stream identical to single-host encode
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 64, 80, 3), dtype=np.uint8)
    enc = MPEG1IntraEncoder(quality=40, gop_size=1, backend="numpy")
    want = enc.encode(frames) + headers.sequence_end()
    got = open(out, "rb").read()
    assert got == want


_FAULT_SCRIPT = r"""
import os, sys
sys.path.insert(0, "__REPO__")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
pid, nproc, workdir, out, log = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4], sys.argv[5])
jax.distributed.initialize("127.0.0.1:__PORT__", num_processes=nproc,
                           process_id=pid)
jax.devices()  # distributed backend init is a collective: every process
               # must join the device exchange, even the numpy-only one
from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
from ec504_imageencoder_tpu.parallel.distributed import encode_multihost
rng = np.random.default_rng(0)  # same frames on every process
frames = rng.integers(0, 256, (6, 64, 80, 3), dtype=np.uint8)

calls = []
def source(s, e):
    if os.environ.get("EC504_DRILL") == "die" and pid == 1 and calls:
        os._exit(42)  # hard kill mid-encode: after GOP 1, before 3 starts
    calls.append((s, e))
    with open(log, "a") as f:
        f.write("%d %d %d\n" % (pid, s, e))
    return frames[s:e]

enc = MPEG1IntraEncoder(quality=40, gop_size=1, backend="numpy")
if os.environ.get("EC504_DRILL") and pid == 0:
    # phase 1, surviving process: encode own GOPs, then the job is torn
    # down before the barrier (preemption semantics) - no stitch yet
    from ec504_imageencoder_tpu.runtime.checkpoint import CheckpointedEncode
    sess = CheckpointedEncode(workdir, enc, 6)
    sess.manifest_path = os.path.join(workdir, "manifest_0.json")
    sess.segments = {}
    sess._load_manifest()
    for g in range(sess.n_gops()):
        if g % nproc == 0 and g not in sess.segments:
            s, e = sess.gop_frame_range(g)
            sess.encode_gop(g, source(s, e))
    # wait until process 1 has banked its first GOP, so the drill state
    # is deterministic (coordinator death also kills the peer via the
    # failure detector), then tear down without distributed shutdown
    import time
    deadline = time.time() + 60
    while not os.path.exists(os.path.join(workdir, "seg_000001.m1vseg")):
        if time.time() > deadline:
            os._exit(3)
        time.sleep(0.05)
    os._exit(0)  # preemption semantics
n = encode_multihost(source, 6, workdir, out, encoder=enc)
print("RESULT", pid, n)
"""


def _run_two_procs(script_path, wd, out, log, env=None, timeout=240):
    full_env = dict(os.environ, **(env or {}))
    procs = [
        subprocess.Popen(
            [sys.executable, script_path, str(pid), "2", wd, out, log],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=full_env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=timeout) for p in procs]
    return procs, outs


def test_multihost_fault_drill(tmp_path):
    """Kill one process mid-encode, restart the job, and assert only the
    missing GOPs re-encode and the stitched stream is byte-identical to a
    single-process encode (the failure model claimed in
    parallel/distributed.py:12-15)."""
    import socket

    def fresh_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wd, out = str(tmp_path / "wd"), str(tmp_path / "out.mpeg")
    log = str(tmp_path / "encodes.log")

    # phase 1: process 1 dies after encoding GOP 1 (of its share 1,3,5);
    # process 0 finishes its share (0,2,4) and the job tears down
    sp1 = str(tmp_path / "p1.py")
    with open(sp1, "w") as f:
        f.write(_FAULT_SCRIPT.replace("__PORT__", str(fresh_port()))
                .replace("__REPO__", repo))
    procs, outs = _run_two_procs(sp1, wd, out, log,
                                 env={"EC504_DRILL": "die"})
    assert procs[0].returncode == 0, outs[0][1].decode()[-2000:]
    # died mid-encode: by its own scripted kill (42) or by the
    # coordination-service failure detector reacting to the teardown (1)
    assert procs[1].returncode in (42, 1), outs[1][1].decode()[-2000:]
    assert not os.path.exists(out)    # no stitched stream yet
    segs = sorted(f for f in os.listdir(wd) if f.endswith(".m1vseg"))
    assert "seg_000001.m1vseg" in segs      # GOP 1 banked before the kill
    assert "seg_000003.m1vseg" not in segs  # GOPs 3, 5 lost with the host
    assert "seg_000005.m1vseg" not in segs

    # phase 2: plain restart, same workdir, fresh coordinator
    sp2 = str(tmp_path / "p2.py")
    with open(sp2, "w") as f:
        f.write(_FAULT_SCRIPT.replace("__PORT__", str(fresh_port()))
                .replace("__REPO__", repo))
    procs, outs = _run_two_procs(sp2, wd, out, log)
    for p, (o, e) in zip(procs, outs):
        assert p.returncode == 0, e.decode()[-2000:]

    # only the dead process's missing GOPs (3, 5) were re-encoded
    phase2 = [tuple(map(int, ln.split())) for ln in
              open(log).read().splitlines()][4:]  # 4 encodes in phase 1
    assert sorted(phase2) == [(1, 3, 4), (1, 5, 6)], phase2

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (6, 64, 80, 3), dtype=np.uint8)
    enc = MPEG1IntraEncoder(quality=40, gop_size=1, backend="numpy")
    want = enc.encode(frames) + headers.sequence_end()
    assert open(out, "rb").read() == want


def test_metrics_histograms_and_derived():
    """EncodeMetrics: timers, histograms, derived frames/s/chip and
    speedup (SURVEY.md §5 metrics row)."""
    import numpy as np

    from ec504_imageencoder_tpu.models.mpeg1 import MPEG1IntraEncoder
    from ec504_imageencoder_tpu.utils.metrics import EncodeMetrics

    m = EncodeMetrics()
    with m.timer("stage_s"):
        pass
    assert m.get("stage_s") >= 0.0

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 64, 80, 3), dtype=np.uint8)
    enc = MPEG1IntraEncoder(quality=40, backend="numpy")
    enc.metrics = m
    enc.encode(frames)
    h = m.get("bits_per_macroblock")
    assert h and h["count"] == 2 * 4  # 2 frames x 4 MB rows
    assert h["min"] > 0 and sum(h["bin_counts"]) == h["count"]

    m.set("frames", 10)
    m.set("encode_s", 2.0)
    m.set("n_devices", 4)
    m.set("baseline_fps", 0.5)
    d = m.derived()
    assert d["encode_fps"] == 5.0
    assert d["encode_fps_per_chip"] == 1.25
    assert d["speedup_vs_baseline"] == 10.0

    m2 = EncodeMetrics()
    m2.set("encode_s", 3.0)
    m.merge(m2)
    assert m.get("encode_s") == 5.0
