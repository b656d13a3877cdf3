"""Distributed runner: host sharding, bucketing, resume manifest, mesh
batch pipeline over the 8 virtual CPU devices; vadalize; CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from phnrec_tpu.io.labels import Label, read_mlf, read_rec
from phnrec_tpu.parallel.distributed import (DistributedRunner, Progress,
                                             bucket_by_frames, shard_list)
from phnrec_tpu.pipeline import SpeechRec
from phnrec_tpu.vad import labels_to_alize

from conftest import golden, package_dir

TEST_RAW = "/root/reference/test.raw"


def test_shard_list():
    entries = [f"u{i}" for i in range(10)]
    shards = [shard_list(entries, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == sorted(entries)
    assert shards[0] == ["u0", "u3", "u6", "u9"]


def test_bucket_by_frames():
    batches = bucket_by_frames([100, 5000, 120, 5100, 9000], max_batch=2,
                               granularity=512)
    flat = sorted(sum(batches, []))
    assert flat == [0, 1, 2, 3, 4]
    for b in batches:
        assert len(b) <= 2


def test_progress_resume(tmp_path):
    p = str(tmp_path / "progress.jsonl")
    pr = Progress.open(p)
    pr.mark("a.raw", 5)
    pr.mark("b.raw", 7)
    pr2 = Progress.open(p)
    assert pr2.done == {"a.raw": 5, "b.raw": 7}


def test_distributed_runner_single_host(tmp_path):
    sr = SpeechRec(package_dir("en"))
    lst = tmp_path / "list.scp"
    lst.write_text(f"{TEST_RAW}\n{TEST_RAW}\n{TEST_RAW}\n")
    mlf = str(tmp_path / "out.mlf")
    runner = DistributedRunner(
        sr, max_batch=2, progress_file=str(tmp_path / "prog.jsonl"))
    metrics = runner.run(str(lst), mlf_path=mlf)
    assert metrics["n_utterances"] == 3
    # EN reads the raw file at its configured 16 kHz: 119846 B = 59923 smp
    assert metrics["audio_seconds"] == pytest.approx(3 * 59923 / 16000,
                                                     abs=0.01)
    out = read_mlf(mlf)
    gold = read_rec(golden("fix_en.rec"))
    for labels in out.values():
        assert [(l.start_frames, l.end_frames, l.name) for l in labels] == \
            [(g.start_frames, g.end_frames, g.name) for g in gold]
    # resume skips everything
    runner2 = DistributedRunner(
        sr, max_batch=2, progress_file=str(tmp_path / "prog.jsonl"))
    metrics2 = runner2.run(str(lst))
    assert metrics2["n_utterances"] == 0


def test_distributed_runner_with_mesh(tmp_path):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    sr = SpeechRec(package_dir("en"))
    lst = tmp_path / "list.scp"
    lst.write_text("".join(f"{TEST_RAW}\n" for _ in range(8)))
    runner = DistributedRunner(sr, mesh=mesh, max_batch=8)
    metrics = runner.run(str(lst), mlf_path=str(tmp_path / "o.mlf"))
    assert metrics["n_utterances"] == 8


def test_vadalize_lines():
    labels = [Label(0, 69, "spk", -71.0), Label(69, 75, "g", -10.0),
              Label(75, 82, "pau", -5.0), Label(82, 90, "d", -2.0)]
    assert labels_to_alize(labels) == ["0.69 0.75 speech",
                                      "0.82 0.90 speech"]


def test_cli_end_to_end(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = str(tmp_path / "out.rec")
    r = subprocess.run(
        [sys.executable, "-m", "phnrec_tpu.cli", "-c", package_dir("en"),
         "-i", TEST_RAW, "-o", out],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    got = read_rec(out)
    gold = read_rec(golden("fix_en.rec"))
    assert [(l.start_frames, l.end_frames, l.name) for l in got] == \
        [(g.start_frames, g.end_frames, g.name) for g in gold]


def test_cli_vadalize(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    out = str(tmp_path / "out.vad")
    r = subprocess.run(
        [sys.executable, "-m", "phnrec_tpu.cli", "--alize", "-c",
         package_dir("en"), "-i", TEST_RAW, "-o", out],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr
    lines = open(out).read().splitlines()
    assert lines and all(l.endswith("speech") for l in lines)
