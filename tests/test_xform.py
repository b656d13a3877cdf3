"""Xform graph tests: parsing + batched application semantics
(STKLib/Models_IO.cc:1188-1700, Models.cc Evaluate methods)."""

import numpy as np

from phnrec_tpu.io.mmf import _Tok
from phnrec_tpu.io.xform import (apply_instance, apply_xform,
                                 parse_mmf_xforms, parse_xform,
                                 parse_xform_instance)


def test_linear_xform_row_major():
    tk = _Tok("<Xform> 2 3  1 2 3  4 5 6")
    xf = parse_xform(tk, {})
    assert xf.kind == "linear" and xf.in_size == 3 and xf.out_size == 2
    x = np.array([[1.0, 1.0, 1.0]], np.float32)
    y = np.asarray(apply_xform(xf, x))
    assert np.allclose(y, [[6.0, 15.0]])        # y[c] = sum_r M[c,r] x[r]


def test_bias_and_func():
    tk = _Tok("<Bias> 2 0.5 -0.5")
    xf = parse_xform(tk, {})
    y = np.asarray(apply_xform(xf, np.zeros((3, 2), np.float32)))
    assert np.allclose(y, [[0.5, -0.5]] * 3)
    tk = _Tok("<Sigmoid> 2")
    xf = parse_xform(tk, {})
    y = np.asarray(apply_xform(xf, np.zeros((1, 2), np.float32)))
    assert np.allclose(y, 0.5)


def test_copy_specs():
    # from:step:to, from:to, single -- 1-based inclusive, ReadCopyXform
    tk = _Tok("<Copy> 5 4  1:2:3 4 2:3")
    xf = parse_xform(tk, {})
    assert list(xf.indices) == [0, 2, 3, 1, 2]
    x = np.arange(4, dtype=np.float32)[None, :] + 10
    y = np.asarray(apply_xform(xf, x))
    assert np.allclose(y, [[10, 12, 13, 11, 12]])


def test_stacking_zero_init_and_order():
    tk = _Tok("<Stacking> 3 2")
    xf = parse_xform(tk, {})
    assert xf.delay == 2 and xf.out_size == 6
    x = np.asarray([[1, 1], [2, 2], [3, 3], [4, 4]], np.float32)
    y = np.asarray(apply_xform(xf, x))
    # row t = [x_{t-2}, x_{t-1}, x_t], zeros before start
    assert np.allclose(y[0], [0, 0, 0, 0, 1, 1])
    assert np.allclose(y[2], [1, 1, 2, 2, 3, 3])
    assert np.allclose(y[3], [2, 2, 3, 3, 4, 4])


def test_composite_layers_and_blocks():
    # layer 1: two blocks (2x2 linear + bias), layer 2: sigmoid over all 4
    text = """<NumLayers> 2
    <Layer> 1 <NumBlocks> 2
      <Block> 1 <Xform> 2 2  2 0  0 2
      <Block> 2 <Bias> 2  1 1
    <Layer> 2 <Sigmoid> 4
    """
    xf = parse_xform(_Tok(text), {})
    assert xf.kind == "composite" and xf.in_size == 4 and xf.out_size == 4
    x = np.array([[1.0, 2.0, 0.0, 0.0]], np.float32)
    y = np.asarray(apply_xform(xf, x))
    expect = 1 / (1 + np.exp(-np.array([2.0, 4.0, 1.0, 1.0])))
    assert np.allclose(y, expect[None], atol=1e-6)


def test_instance_chain_and_macros(tmp_path):
    mmf = """~o <VecSize> 2 <DIAGC>
~x "lin" <Xform> 2 2  1 0  0 1
~j "base" <VecSize> 2 ~x "lin"
~j "stacked" <Input> ~j "base" <VecSize> 6 <Stacking> 3 2
"""
    p = tmp_path / "x.mmf"
    p.write_text(mmf)
    xm, jm, inp = parse_mmf_xforms(str(p))
    assert "lin" in xm and set(jm) == {"base", "stacked"}
    inst = jm["stacked"]
    assert inst.total_delay == 2
    x = np.asarray([[1, 1], [2, 2], [3, 3]], np.float32)
    y = np.asarray(apply_instance(inst, x))
    assert y.shape == (3, 6)
    assert np.allclose(y[2], [1, 1, 2, 2, 3, 3])


def test_global_input_xform(tmp_path):
    mmf = """~o <VecSize> 2
<InputXform> <VecSize> 2 <Bias> 2 1.0 2.0
"""
    p = tmp_path / "g.mmf"
    p.write_text(mmf)
    _, _, inp = parse_mmf_xforms(str(p))
    assert inp is not None
    y = np.asarray(apply_instance(inp, np.zeros((1, 2), np.float32)))
    assert np.allclose(y, [[1.0, 2.0]])


def test_stateful_chunked_equals_whole(tmp_path):
    """Carried delay-line application (StreamingXform) must equal the
    whole-utterance apply_instance for any chunking — the per-frame
    UpdateStacks semantics (Viterbi.cc:2068, Models.h:891-1028)."""
    from phnrec_tpu.io.xform import (StreamingXform, apply_instance,
                                     parse_mmf_xforms)

    mmf = """~o <VecSize> 2 <DIAGC>
~x "comp" <NumLayers> 2
  <Layer> 1 <NumBlocks> 2
    <Block> 1 <Stacking> 3 1
    <Block> 2 <Xform> 1 1  2
  <Layer> 2 <Xform> 2 4  1 0 0 0  0 0 1 1
~j "base" <VecSize> 4 <Stacking> 2 2
~j "top" <Input> ~j "base" <VecSize> 2 ~x "comp"
"""
    p = tmp_path / "s.mmf"
    p.write_text(mmf)
    _, jm, _ = parse_mmf_xforms(str(p))
    inst = jm["top"]
    rng = np.random.default_rng(3)
    x = rng.normal(size=(57, 2)).astype(np.float32)
    want = np.asarray(apply_instance(inst, x))
    for chunks in ([57], [10, 20, 27], [1] * 57, [3, 50, 4]):
        sx = StreamingXform(inst)
        outs = []
        off = 0
        for c in chunks:
            outs.append(np.asarray(sx(x[off : off + c])))
            off += c
        np.testing.assert_allclose(np.concatenate(outs), want, atol=1e-6,
                                   err_msg=f"chunks={chunks}")
