"""Finite-state machine with AT&T binary I/O (reference: fsm.{cpp,h}).

The reference bundles a general FSM/FST library (tropical/log semirings,
composition, caching); phnrec itself exercises only the subset used by
the G2P transducer: load an AT&T-binary rules automaton and walk it by
input symbol (first matching arc wins — FSM::GetNextNodeIS,
fsm.cpp:175-188).  This module implements that subset natively plus the
writer, so rule automata can be built and persisted without the C++
tooling.

Binary layout (FSM::LoadBinAtt, fsm.cpp:444-600; ATT_BIN_* structs,
fsm.h:86-108), all little-endian:
  signature line "FSM\\n" (or "FSM/failure\\n" + uint32 failure label
  + "FSM\\n"), then uint32 {fsmClass, semiring, nNodes, startNode}, then
  per node: float potential, float termWeight, uint32 nArcs, followed by
  nArcs x {uint32 labelFrom, uint32 labelTo, float weight, uint32 target}.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional

SEMIRING_TROPICAL = 0
SEMIRING_LOG = 1


@dataclass
class Arc:
    label_from: int
    label_to: int
    weight: float
    target: int              # node index


@dataclass
class FsmNode:
    potential: float = 0.0
    term_weight: float = float("inf")   # inf = non-terminal
    arcs: List[Arc] = field(default_factory=list)


@dataclass
class FSM:
    nodes: List[FsmNode] = field(default_factory=list)
    start: int = 0
    fsm_class: int = 0
    semiring: int = SEMIRING_TROPICAL
    failure_label: Optional[int] = None

    def add_node(self) -> int:
        self.nodes.append(FsmNode())
        return len(self.nodes) - 1

    def add_arc(self, src: int, label_from: int, label_to: int,
                weight: float, target: int) -> None:
        self.nodes[src].arcs.append(Arc(label_from, label_to, weight,
                                        target))

    def next_node_is(self, node: int, isymbol: int) -> Optional[int]:
        """First arc with matching input label (fsm.cpp:175-188)."""
        for arc in self.nodes[node].arcs:
            if arc.label_from == isymbol:
                return arc.target
        return None

    def arcs_from(self, node: int) -> List[Arc]:
        return self.nodes[node].arcs

    # ------------------------------------------------------------------
    @classmethod
    def load_bin_att(cls, path: str) -> "FSM":
        with open(path, "rb") as f:
            data = f.read()
        pos = data.index(b"\n")
        signature = data[:pos].decode("latin-1")
        pos += 1
        failure = None
        if signature == "FSM/failure":
            (failure,) = struct.unpack_from("<I", data, pos)
            pos += 4
            end = data.index(b"\n", pos)
            signature = data[pos:end].decode("latin-1")
            pos = end + 1
        if signature != "FSM":
            raise ValueError(f"unsupported FSM format {signature!r}")
        fsm_class, semiring, n_nodes, start = struct.unpack_from(
            "<4I", data, pos)
        pos += 16
        fsm = cls(fsm_class=fsm_class, semiring=semiring, start=start,
                  failure_label=failure)
        for _ in range(n_nodes):
            pot, term, n_arcs = struct.unpack_from("<ffI", data, pos)
            pos += 12
            node = FsmNode(potential=pot, term_weight=term)
            for _ in range(n_arcs):
                lf, lt, w, tgt = struct.unpack_from("<IIfI", data, pos)
                pos += 16
                node.arcs.append(Arc(lf, lt, w, tgt))
            fsm.nodes.append(node)
        return fsm

    def save_bin_att(self, path: str) -> None:
        with open(path, "wb") as f:
            if self.failure_label is not None:
                f.write(b"FSM/failure\n")
                f.write(struct.pack("<I", self.failure_label))
            f.write(b"FSM\n")
            f.write(struct.pack("<4I", self.fsm_class, self.semiring,
                                len(self.nodes), self.start))
            for node in self.nodes:
                f.write(struct.pack("<ffI", node.potential,
                                    node.term_weight, len(node.arcs)))
                for a in node.arcs:
                    f.write(struct.pack("<IIfI", a.label_from, a.label_to,
                                        a.weight, a.target))

    # ------------------------------------------------------------------
    @classmethod
    def load_txt_att(cls, path: str) -> "FSM":
        """AT&T text format: `src dst ilabel olabel [weight]` arcs and
        `final [weight]` terminal lines (ids are integers)."""
        fsm = cls()

        def node(i: int) -> int:
            while len(fsm.nodes) <= i:
                fsm.add_node()
            return i

        first = True
        for line in open(path, encoding="latin-1"):
            parts = line.split()
            if not parts:
                continue
            if len(parts) >= 4:
                s, d, il, ol = (int(parts[0]), int(parts[1]),
                                int(parts[2]), int(parts[3]))
                w = float(parts[4]) if len(parts) > 4 else 0.0
                node(max(s, d))
                fsm.add_arc(s, il, ol, w, d)
                if first:
                    fsm.start = s
                    first = False
            else:
                s = int(parts[0])
                w = float(parts[1]) if len(parts) > 1 else 0.0
                fsm.nodes[node(s)].term_weight = w
        return fsm
