"""Network-surgery tests (Net.cc equivalents: null-node removal, self-link
expansion, dictionary expansion, triphone expansion, local optimization)."""

import numpy as np

from phnrec_tpu.io.stknet import NT_MODEL, NT_WORD, parse_stk_network
from phnrec_tpu.net_ops import (expand_by_dictionary, expand_to_triphones,
                                lattice_local_optimization,
                                remove_null_nodes, self_links_to_null_nodes)


def linear_word_net(words):
    """start -> w1 -> w2 -> ... -> end (null first/last nodes)."""
    lines = ["I=0 W=!NULL"]
    for i, w in enumerate(words, start=1):
        lines.append(f"I={i} W={w}")
    lines.append(f"I={len(words) + 1} W=!NULL")
    arcs = []
    for i in range(len(words) + 1):
        arcs.append(f"I={i} E={i + 1}")
    # STK format: nodes then arcs; our parser takes arcs on node lines
    text = "\n".join(f"{l} E={i + 1}" if i <= len(words) else l
                     for i, l in enumerate(lines))
    return parse_stk_network(text, is_text=True)


def test_remove_null_nodes():
    text = """I=0 W=!NULL E=1
I=1 W=!NULL E=2 l=-1.5
I=2 W=hello E=3
I=3 W=!NULL
"""
    net = parse_stk_network(text, is_text=True)
    out = remove_null_nodes(net)
    idents = [n.ident for n in out.nodes]
    assert "1" not in idents                    # interior null bypassed
    first = out.nodes[0]
    assert first.links[0][0].word == "hello"
    assert np.isclose(first.links[0][1], -1.5)  # likes summed
    assert out.first.ident == "0" and out.last.word is None


def test_self_links_to_null_nodes():
    text = """I=0 W=!NULL E=1
I=1 M=a E=1 E=2
I=2 W=!NULL
"""
    net = parse_stk_network(text, is_text=True)
    out = self_links_to_null_nodes(net)
    a = [n for n in out.nodes if n.model == "a"][0]
    assert all(t is not a for t, _ in a.links)      # self-arc gone
    null = [t for t, _ in a.links if t.is_null and t.ident.endswith("#self")]
    assert len(null) == 1 and null[0].links[0][0] is a


def test_expand_by_dictionary_keep_words():
    net = linear_word_net(["cat"])
    d = {"cat": [(["k", "ae", "t"], 0.0), (["k", "a", "t"], -0.7)]}
    out = expand_by_dictionary(net, d, keep_word_nodes=True)
    models = [n.model for n in out.nodes if n.is_model]
    assert models.count("k") == 2 and "ae" in models and "a" in models
    # word node survives; both chains end in it
    wn = [n for n in out.nodes if n.word == "cat"]
    assert len(wn) == 1
    enders = [n for n in out.nodes
              if any(t is wn[0] for t, _ in n.links)]
    assert {e.model for e in enders} == {"t"}
    # second variant carries its pronunciation log-prob on the entry arc
    start = out.first
    likes = sorted(l for _, l in start.links)
    assert np.isclose(likes[0], -0.7) and likes[1] == 0.0


def test_expand_by_dictionary_fold_words():
    net = linear_word_net(["go"])
    d = {"go": [(["g", "ow"], 0.0)]}
    out = expand_by_dictionary(net, d, keep_word_nodes=False)
    tails = [n for n in out.nodes if n.word == "go"]
    assert len(tails) == 1 and tails[0].model == "ow"
    assert tails[0].ntype & NT_MODEL and tails[0].ntype & NT_WORD


def test_expand_to_triphones_linear():
    text = """I=0 W=!NULL E=1
I=1 M=sil E=2
I=2 M=a E=3
I=3 M=b E=4
I=4 M=c E=5
I=5 M=sil E=6
I=6 W=!NULL
"""
    net = parse_stk_network(text, is_text=True)
    out = expand_to_triphones(net)
    models = [n.model for n in out.nodes if n.is_model]
    # STK naming walk: CI phones give context but take none (Net.cc:1080+)
    assert "sil-a+b" in models
    assert "a-b+c" in models
    assert "b-c+sil" in models
    assert models.count("sil") == 2  # ci phones themselves untouched


def test_expand_to_triphones_branching_right_context():
    # a -> (b | c): 'a' must split per right context
    text = """I=0 W=!NULL E=1
I=1 M=a E=2 E=3
I=2 M=b E=4
I=3 M=c E=4
I=4 W=!NULL
"""
    net = parse_stk_network(text, is_text=True)
    out = expand_to_triphones(net)
    models = sorted(n.model for n in out.nodes if n.is_model)
    assert "a+b" in models and "a+c" in models
    assert "a-b" in models and "a-c" in models
    # each split 'a' keeps exactly its own right-context arc
    for n in out.nodes:
        if n.model == "a+b":
            assert {t.model for t, _ in n.links} == {"a-b"}
        if n.model == "a+c":
            assert {t.model for t, _ in n.links} == {"a-c"}


def test_lattice_local_optimization_merges_diamonds():
    # two identical parallel paths collapse into one
    text = """I=0 W=!NULL E=1 E=2
I=1 M=x E=3
I=2 M=x E=3
I=3 W=!NULL
"""
    net = parse_stk_network(text, is_text=True)
    out = lattice_local_optimization(net)
    xs = [n for n in out.nodes if n.model == "x"]
    assert len(xs) == 1
    assert len(out.first.links) == 1
