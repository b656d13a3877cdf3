"""FSM algebra (fsm.cpp:923-1433): composition, semirings, arc sorting,
label surgery, SVite conversion, shortest distance.  Composition is
checked against brute-force path enumeration of the product language."""

import math

import pytest

from phnrec_tpu.fsm import (EPS, FSM, LABEL_INPUT, LABEL_OUTPUT, NF_MODEL,
                            NF_WORD, SEMIRING_LOG, SEMIRING_TROPICAL,
                            compose, sr_plus, sr_times)


def _linear(pairs, weight_step=0.5):
    """Chain transducer for a single (input, output) label sequence."""
    f = FSM()
    cur = f.add_node()
    f.start = cur
    for k, (i, o) in enumerate(pairs):
        nxt = f.add_node()
        f.add_arc(cur, i, o, weight_step * (k + 1), nxt)
        cur = nxt
    f.nodes[cur].term_weight = 0.25
    return f


def _paths(f, max_len=8):
    """All accepted (input, output, weight) paths up to max_len arcs."""
    out = []

    def walk(node, ins, outs, w, depth):
        n = f.nodes[node]
        if n.is_terminal:
            out.append((tuple(ins), tuple(outs), w + n.term_weight))
        if depth == max_len:
            return
        for a in n.arcs:
            walk(a.target, ins + ([a.label_from] if a.label_from else []),
                 outs + ([a.label_to] if a.label_to else []),
                 w + a.weight, depth + 1)

    walk(f.start, [], [], 0.0, 0)
    return sorted(out)


def test_compose_chain():
    # A: 1:2 then 3:4 ; B: 2:7, 4:9  => A∘B maps 1 3 -> 7 9
    A = _linear([(1, 2), (3, 4)])
    B = _linear([(2, 7), (4, 9)], weight_step=0.25)
    C = compose(A, B)
    paths = _paths(C)
    assert paths == [((1, 3), (7, 9),
                      pytest.approx(0.5 + 1.0 + 0.25 + 0.5 + 0.25 + 0.25))]


def test_compose_mismatch_empty():
    A = _linear([(1, 2)])
    B = _linear([(3, 7)])
    C = compose(A, B)
    assert _paths(C) == []


def test_compose_epsilon_and_product():
    # A has an output-eps arc; B has two same-input arcs (full product)
    A = FSM()
    a0, a1, a2 = A.add_node(), A.add_node(), A.add_node()
    A.start = a0
    A.add_arc(a0, 5, EPS, 0.1, a1)     # eps output: advances A alone
    A.add_arc(a1, 1, 2, 0.2, a2)
    A.nodes[a2].term_weight = 0.0
    B = FSM()
    b0, b1, b2 = B.add_node(), B.add_node(), B.add_node()
    B.start = b0
    B.add_arc(b0, 2, 8, 0.3, b1)
    B.add_arc(b0, 2, 9, 0.4, b2)       # duplicate input label
    B.nodes[b1].term_weight = 0.0
    B.nodes[b2].term_weight = 0.0
    C = compose(A, B)
    got = _paths(C)
    assert ((5, 1), (8,), pytest.approx(0.6)) in got
    assert ((5, 1), (9,), pytest.approx(0.7)) in got
    assert len(got) == 2


def test_semiring_ops():
    assert sr_plus(SEMIRING_TROPICAL, 1.0, 2.0) == 1.0
    assert sr_times(SEMIRING_TROPICAL, 1.0, 2.0) == 3.0
    # log semiring: -log(e^-1 + e^-2)
    assert sr_plus(SEMIRING_LOG, 1.0, 2.0) == pytest.approx(
        -math.log(math.exp(-1) + math.exp(-2)))
    with pytest.raises(ValueError):
        compose(FSM(semiring=SEMIRING_LOG), FSM())


def test_sort_remove_replace():
    f = FSM()
    n0, n1 = f.add_node(), f.add_node()
    f.add_arc(n0, 3, 9, 0.0, n1)
    f.add_arc(n0, 1, 8, 0.0, n1)
    f.add_arc(n0, 2, 7, 0.0, n0)
    f.sort_arcs("label_from")
    assert [a.label_from for a in f.nodes[0].arcs] == [1, 2, 3]
    f.sort_arcs("label_to")
    assert [a.label_to for a in f.nodes[0].arcs] == [7, 8, 9]
    f.replace_labels({9: 5}, LABEL_OUTPUT)
    assert sorted(a.label_to for a in f.nodes[0].arcs) == [5, 7, 8]
    f.remove_arcs(1, 2, LABEL_INPUT)
    assert [a.label_from for a in f.nodes[0].arcs] == [3]


def test_remove_free_nodes():
    f = FSM()
    n0, n1, n2 = f.add_node(), f.add_node(), f.add_node()
    f.start = n0
    f.add_arc(n0, 1, 1, 0.0, n2)       # n1 unreachable
    f.nodes[n2].term_weight = 0.0
    f.remove_free_nodes()
    assert len(f.nodes) == 2
    assert _paths(f) == [((1,), (1,), 0.0)]


def test_shortest_distance_tropical():
    f = FSM()
    n0, n1, n2 = f.add_node(), f.add_node(), f.add_node()
    f.start = n0
    f.add_arc(n0, 1, 1, 1.0, n1)
    f.add_arc(n0, 2, 2, 5.0, n2)
    f.add_arc(n1, 3, 3, 1.0, n2)
    d = f.shortest_distance()
    assert d[n2] == pytest.approx(2.0)   # 1+1 beats 5


def test_convert2_svite():
    """1:2-labelled arc becomes eps -> MODEL(1) -> WORD(2) -> eps chain."""
    f = FSM()
    n0, n1 = f.add_node(), f.add_node()
    f.start = n0
    f.add_arc(n0, 1, 2, 0.5, n1)
    f.add_arc(n0, 3, EPS, 0.1, n1)     # second incoming: n1 not reusable
    f.nodes[n1].term_weight = 0.0
    f.convert2_svite()
    # all arcs are now eps-labelled
    assert all(a.label_from == EPS and a.label_to == EPS
               for n in f.nodes for a in n.arcs)
    models = [n for n in f.nodes if n.flag == NF_MODEL]
    words = [n for n in f.nodes if n.flag == NF_WORD]
    assert [m.potential for m in models] == [1.0, 3.0]
    assert [w.potential for w in words] == [2.0]
    # path start -> model(1) -> word(2) -> terminal exists
    m1 = f.nodes.index(models[0])
    w2 = f.nodes.index(words[0])
    assert any(a.target == m1 for a in f.nodes[f.start].arcs)
    assert any(a.target == w2 for a in f.nodes[m1].arcs)


def test_shortest_distance_log_semiring():
    """Log semiring: distance = -log of the path-weight sum; the residual
    algorithm must count each path exactly once (naive Bellman rounds
    re-add accumulated mass)."""
    f = FSM(semiring=SEMIRING_LOG)
    n0, n1, n2 = f.add_node(), f.add_node(), f.add_node()
    f.start = n0
    f.add_arc(n0, 1, 1, 1.0, n1)
    f.add_arc(n0, 2, 2, 0.5, n2)
    f.add_arc(n2, 3, 3, 0.0, n1)
    d = f.shortest_distance()
    want = -math.log(math.exp(-1.0) + math.exp(-0.5))
    assert d[n1] == pytest.approx(want, abs=1e-6)
    # cyclic: geometric series  sum_k e^-(1 + 2k) = e^-1 / (1 - e^-2)
    g = FSM(semiring=SEMIRING_LOG)
    a, b = g.add_node(), g.add_node()
    g.start = a
    g.add_arc(a, 1, 1, 1.0, b)
    g.add_arc(b, 1, 1, 2.0, b)        # self loop
    d = g.shortest_distance()
    want = -math.log(math.exp(-1.0) / (1.0 - math.exp(-2.0)))
    assert d[b] == pytest.approx(want, abs=1e-6)
