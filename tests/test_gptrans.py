"""FSM AT&T binary I/O and grapheme-to-phoneme transduction."""

import pytest

from phnrec_tpu.fsm import FSM
from phnrec_tpu.gptrans import GPTranscriber, UnknownGraphemeError


@pytest.fixture
def toy(tmp_path):
    """symbols: a=1 b=2 +=3; phonemes A=10 B=11 B2=12; '-'=0.
    Rules: 'a' -> A (1.0); 'b' -> B (0.7) | B2 (0.3); 'a' before 'b'
    (context key a,b) -> AA (13, 0.9) via a deeper path."""
    fsm = FSM()
    n0, na, nb, nab = (fsm.add_node() for _ in range(4))
    fsm.add_arc(n0, 1, 10, 1.0, na)     # a -> A
    fsm.add_arc(na, 2, 13, 0.9, nab)    # deeper: a with right-context b
    fsm.add_arc(n0, 2, 11, 0.7, nb)     # b -> B
    fsm.add_arc(n0, 2, 12, 0.3, nb)     # b -> B2
    fsm.start = n0
    rules = str(tmp_path / "rules.fsm")
    fsm.save_bin_att(rules)
    symbols = str(tmp_path / "symbols")
    with open(symbols, "w") as f:
        f.write("a 1\nb 2\n+ 3\nA 10\nB 11\nB2 12\nAA 13\n- 0\n")
    g = GPTranscriber()
    g.load_rules(rules)
    g.load_symbols(symbols)
    return g


def test_fsm_binary_roundtrip(tmp_path):
    fsm = FSM(failure_label=7)
    n0 = fsm.add_node()
    n1 = fsm.add_node()
    fsm.add_arc(n0, 1, 2, 0.5, n1)
    fsm.nodes[n1].term_weight = 0.0
    p = str(tmp_path / "x.fsm")
    fsm.save_bin_att(p)
    back = FSM.load_bin_att(p)
    assert back.failure_label == 7
    assert len(back.nodes) == 2
    a = back.nodes[0].arcs[0]
    assert (a.label_from, a.label_to, a.weight, a.target) == (1, 2, 0.5, 1)
    assert back.nodes[1].term_weight == 0.0


def test_generate_variants(toy):
    entries = toy.generate("b")
    assert [e.trans for e in entries] == ["B", "B2"]
    assert entries[0].prob == pytest.approx(0.7)


def test_context_rule_wins(toy):
    # for 'ab' at position 0 the key is a,b,+,... -> walks deeper via
    # (a)->(b): rules come from node na with label b -> AA
    entries = toy.generate("ab")
    best = entries[0]
    assert best.trans.startswith("AA")


def test_unknown_grapheme(toy):
    with pytest.raises(UnknownGraphemeError):
        toy.generate("xyz")


def test_max_variants_and_scale(toy):
    toy.max_variants = 1
    toy.scale_prob = True
    entries = toy.generate("b")
    assert len(entries) == 1
    assert entries[0].prob == pytest.approx(1.0)


def test_fsm_text_loader(tmp_path):
    p = tmp_path / "t.fst"
    p.write_text("0 1 1 10 0.5\n1 2 2 11\n2 0.0\n")
    fsm = FSM.load_txt_att(str(p))
    assert len(fsm.nodes) == 3
    assert fsm.next_node_is(0, 1) == 1
    assert fsm.nodes[2].term_weight == 0.0
