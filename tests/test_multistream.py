"""Multi-stream streaming: N concurrent streams through one fused block
dispatch must decode each stream exactly as the single-stream
StreamingRecognizer does (the per-stream semantics of srec.cpp:793-927,
batched into the lane axis)."""

import numpy as np
import pytest

from phnrec_tpu.multistream import MultiStreamRecognizer
from phnrec_tpu.pipeline import SpeechRec
from phnrec_tpu.streaming import StreamingRecognizer

from conftest import package_dir

TEST_RAW = "/root/reference/test.raw"


@pytest.fixture(scope="module")
def sr_en():
    return SpeechRec(package_dir("en"))


@pytest.fixture(scope="module")
def raw_bytes():
    return open(TEST_RAW, "rb").read()


def _streams(raw, n):
    """n distinct byte streams sliced/shifted from test.raw (even sample
    counts so lin16 frames stay aligned)."""
    out = []
    for i in range(n):
        lo = (i * 1024) % (len(raw) // 2)
        lo -= lo % 2
        hi = len(raw) - (i * 4096) % (len(raw) // 3)
        hi -= hi % 2
        out.append(raw[lo:hi])
    return out


def _single_stream_labels(sr, stream_bytes, block):
    rec = StreamingRecognizer(sr, block_frames=block)
    rec.process(stream_bytes)
    return rec.finish()


def _key(labels):
    return [(l.start_frames, l.end_frames, l.name) for l in labels]


def test_multistream_matches_single(sr_en, raw_bytes):
    streams = _streams(raw_bytes, 4)
    ms = MultiStreamRecognizer(sr_en, n_streams=4, block_frames=64)
    # interleave feeding in uneven chunks
    offsets = [0] * 4
    chunk = 7000
    while any(o < len(s) for o, s in zip(offsets, streams)):
        for i, s in enumerate(streams):
            if offsets[i] < len(s):
                ms.process(i, s[offsets[i] : offsets[i] + chunk])
                offsets[i] += chunk
    got = ms.finish()
    for i, s in enumerate(streams):
        want = _single_stream_labels(sr_en, s, 64)
        assert _key(got[i]) == _key(want), f"stream {i} diverged"
        for a, b in zip(got[i], want):
            assert a.score == pytest.approx(b.score, abs=1e-3)


def test_multistream_ragged_and_short(sr_en, raw_bytes):
    """Streams of very different lengths, including one shorter than the
    STC latency and one with zero audio."""
    streams = [raw_bytes, raw_bytes[: 8 * 2 * 800],   # 0.1 s (10 frames)
               raw_bytes[: 2 * 4000], b""]            # 0.5 s, empty
    ms = MultiStreamRecognizer(sr_en, n_streams=4, block_frames=64)
    for i, s in enumerate(streams):
        if s:
            ms.process(i, s)
        ms.end_stream(i)
    got = ms.finish()
    for i, s in enumerate(streams):
        if not s:
            assert got[i] == []
            continue
        want = _single_stream_labels(sr_en, s, 64)
        assert _key(got[i]) == _key(want), f"stream {i} diverged"


def test_multistream_n1_equals_single(sr_en, raw_bytes):
    ms = MultiStreamRecognizer(sr_en, n_streams=1, block_frames=64)
    ms.process(0, raw_bytes)
    got = ms.finish()[0]
    want = _single_stream_labels(sr_en, raw_bytes, 64)
    assert _key(got) == _key(want)


def test_multistream_device_dispatch_path(sr_en, raw_bytes):
    """dispatch_block_device (the pre-staged HBM path) must equal the
    byte-fed path."""
    import jax.numpy as jnp

    n, block = 2, 64
    spec = sr_en.frontend.spec
    spb = block * spec.step
    wave = np.frombuffer(raw_bytes, dtype="<i2")
    n_blocks = (wave.shape[0] - (spec.vector_size - spec.step)) // spb
    ms = MultiStreamRecognizer(sr_en, n_streams=n, block_frames=block)
    dev = jnp.asarray(np.stack([wave] * n))
    # split across both device-feeding APIs: a multi-block scanned
    # dispatch, then per-block dispatches for the rest
    half = n_blocks // 2
    ms.decode_device_buffer(dev, half)
    for k in range(half, n_blocks):
        ms.dispatch_from_device_buffer(dev, k * spb)
    # remaining samples go through the byte path, then finish
    consumed = n_blocks * spb
    tail = wave[consumed:].tobytes()
    for i in range(n):
        if tail:
            ms.process(i, tail)
    got = ms.finish()
    want = _single_stream_labels(sr_en, raw_bytes, block)
    for i in range(n):
        assert _key(got[i]) == _key(want), f"stream {i} diverged"


def test_multistream_mesh_sharded_equals_unsharded(sr_en, raw_bytes):
    """Streams shard across an 8-device mesh (stream axis = 'data'); the
    sharded recognizer must produce exactly the unsharded outputs —
    multi-chip serving is N x D streams with zero collectives."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, axis_names=("data",))
    streams = _streams(raw_bytes, 8)
    want = MultiStreamRecognizer(sr_en, n_streams=8, block_frames=64)
    got = MultiStreamRecognizer(sr_en, n_streams=8, block_frames=64,
                                mesh=mesh)
    for ms in (want, got):
        for i, s in enumerate(streams):
            ms.process(i, s)
    got_l, want_l = got.finish(), want.finish()
    for i in range(8):
        assert _key(got_l[i]) == _key(want_l[i]), f"stream {i}"


def test_multistream_mesh_device_buffer(sr_en, raw_bytes):
    """The scanned device-buffer path under a mesh (shard_audio)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    n, block = 8, 64
    spec = sr_en.frontend.spec
    spb = block * spec.step
    wave = np.frombuffer(raw_bytes, dtype="<i2")
    L = wave.shape[0] - (wave.shape[0] - (spec.vector_size - spec.step)) \
        % spb
    n_blocks = (L - (spec.vector_size - spec.step)) // spb
    audio = np.stack([np.roll(wave, -i * 1600)[:L] for i in range(n)])

    ms = MultiStreamRecognizer(sr_en, n_streams=n, block_frames=block,
                               mesh=mesh)
    ms.decode_device_buffer(ms.shard_audio(audio), n_blocks)
    got = ms.finish()

    ref = MultiStreamRecognizer(sr_en, n_streams=n, block_frames=block)
    ref.decode_device_buffer(jnp.asarray(audio), n_blocks)
    want = ref.finish()
    for i in range(n):
        assert _key(got[i]) == _key(want[i]), f"stream {i}"


def test_commit_horizon_bounds_memory_and_matches(sr_en, raw_bytes):
    """Opt-in fixed-lag commit: long sessions keep O(horizon) history
    (blocks drop as their rows commit) while the stitched output equals
    the full-history decode (paths settle within the lag on speech)."""
    streams = _streams(raw_bytes, 3)
    full = MultiStreamRecognizer(sr_en, n_streams=3, block_frames=32)
    com = MultiStreamRecognizer(sr_en, n_streams=3, block_frames=32,
                                commit_horizon=60)
    max_blocks = 0
    offsets = [0] * 3
    chunk = 7000
    while any(o < len(s) for o, s in zip(offsets, streams)):
        for i, s in enumerate(streams):
            if offsets[i] < len(s):
                for m in (full, com):
                    m.process(i, s[offsets[i] : offsets[i] + chunk])
                offsets[i] += chunk
        max_blocks = max(max_blocks, len(com._hist))
        com.results()      # live polling through the committed path
    got, want = com.finish(), full.finish()
    assert com._frame0.min() > 0, "no commit ever happened"
    # retained window stayed bounded: 2*horizon + block frames of blocks
    # (plus in-flight); the full recognizer retains everything
    assert max_blocks < len(full._hist)
    for i in range(3):
        assert _key(got[i]) == _key(want[i]), f"stream {i} diverged"
        for a, b in zip(got[i], want[i]):
            assert a.score == pytest.approx(b.score, abs=1e-2)


def test_partial_pump_no_head_of_line_blocking(sr_en, raw_bytes):
    """partial_pump: a stream fed 10x slower must not stall the fast
    streams — their labels arrive while the slow stream trickles — and
    the final outputs still equal the single-stream recognizer."""
    fast = raw_bytes
    n_slow = len(raw_bytes) // 10 // 2 * 2
    slow = raw_bytes[:n_slow]
    ms = MultiStreamRecognizer(sr_en, n_streams=3, block_frames=64,
                               partial_pump=True)
    chunk = 20000                      # fast chunk; slow gets 1/10th
    off = 0
    saw_fast_labels_early = False
    while off < len(fast):
        ms.process(0, fast[off : off + chunk])
        ms.process(1, fast[off : off + chunk])
        s0 = off // 10 // 2 * 2
        s1 = (off + chunk) // 10 // 2 * 2
        ms.process(2, slow[s0:s1])
        off += chunk
        if off >= len(fast) // 2:
            res = ms.results()
            # fast streams have decoded labels covering a region the
            # slow stream hasn't even fed yet
            if res[0] and res[0][-1].end_frames * 80 > s1:
                saw_fast_labels_early = True
    assert saw_fast_labels_early, "fast streams were head-of-line blocked"
    for i in range(3):
        ms.end_stream(i)
    got = ms.finish()
    for i, s in enumerate((fast, fast, slow)):
        want = _single_stream_labels(sr_en, s, 64)
        assert _key(got[i]) == _key(want), f"stream {i} diverged"


def test_partial_pump_lockstep_unchanged(sr_en, raw_bytes):
    """With uniform feeding, partial_pump produces exactly the lockstep
    outputs (the policy only changes WHEN dispatches happen)."""
    streams = _streams(raw_bytes, 3)
    a = MultiStreamRecognizer(sr_en, n_streams=3, block_frames=64)
    b = MultiStreamRecognizer(sr_en, n_streams=3, block_frames=64,
                              partial_pump=True)
    for ms in (a, b):
        for i, s in enumerate(streams):
            ms.process(i, s)
    la, lb = a.finish(), b.finish()
    for i in range(3):
        assert _key(la[i]) == _key(lb[i])


def test_commit_device_path_no_host_fetch_and_cache_stable(sr_en,
                                                           raw_bytes):
    """Lockstep commit-horizon sessions must stay on the DEVICE commit
    path (retained blocks never fetched to host; only segments cross)
    and the walk/rebase program cache must stop growing once the sliding
    window pattern cycles — polling results() in steady state compiles
    nothing new (VERDICT r4 item 9)."""
    ms = MultiStreamRecognizer(sr_en, n_streams=8, block_frames=32,
                               commit_horizon=48)
    chunk = 32 * 320 * 2            # one block of samples per chunk (EN)
    n_chunks = min(len(raw_bytes) // chunk, 36)
    sizes = []
    for c in range(n_chunks):
        for i in range(8):
            ms.process(i, raw_bytes[c * chunk : (c + 1) * chunk])
        ms.results()                # live polling through the device walk
        sizes.append(len(ms._res_cache))
    assert ms._frame0.min() > 0, "no commit happened"
    # blocks stayed on device: the host fallback was never taken
    assert not isinstance(ms._hist[0][0][0], np.ndarray)
    # program cache saturates: no new compiles over the last third
    third = len(sizes) // 3
    assert sizes[-1] == sizes[-third], f"cache kept growing: {sizes}"
    got = ms.finish()
    full = MultiStreamRecognizer(sr_en, n_streams=8, block_frames=32)
    for c in range(n_chunks):
        for i in range(8):
            full.process(i, raw_bytes[c * chunk : (c + 1) * chunk])
    want = full.finish()
    for i in range(8):
        assert _key(got[i]) == _key(want[i]), f"stream {i} diverged"


def test_conv_assembly_path_matches_single(sr_en, raw_bytes,
                                           monkeypatch):
    """The conv-based LCRC assembly (used from 128 streams up in
    production) must produce the single-stream recognizer's labels —
    forced on at small scale via the class threshold so the >=128
    regime's numeric path is covered by the parity suite."""
    monkeypatch.setattr(MultiStreamRecognizer,
                        "conv_assembly_min_streams", 2)
    streams = _streams(raw_bytes, 3)
    ms = MultiStreamRecognizer(sr_en, n_streams=3, block_frames=64)
    for i, s in enumerate(streams):
        ms.process(i, s)
        ms.end_stream(i)
    got = ms.finish()
    for i, s in enumerate(streams):
        want = _single_stream_labels(sr_en, s, 64)
        assert _key(got[i]) == _key(want), f"stream {i} diverged"
        for a, b in zip(got[i], want):
            assert a.score == pytest.approx(b.score, abs=5e-3)
