"""Hypothesis property test: the Spark engine's set-oriented commit
semantics equal a trivial sequential in-memory interpreter of the same op
sequence — the QuickCheck/GenT idea behind the reference's
``prop_serializeDeserializePreservesStats``
(InternalTests/GraphTests.hs:169-187) with the model-based twist: instead
of roundtripping one engine, we compare the engine against an oracle
implementation whose correctness is obvious.

Each example costs a real Spark commit per tx, so the example budget is
small; the state space (new/add/remove/remove_target/set_value interleaved)
is still explored far beyond the hand-written unit tests.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_db_spark.catalogue import catalogue_schema
from graph_db_spark.graph import GraphSession, GraphSnapshot
from graph_db_spark.model import ROOT_ID


class PyGraph:
    """The obviously-correct sequential interpreter (the reference's
    Graph.hs semantics, minus indexes we re-derive at the end)."""

    def __init__(self):
        self.values = {ROOT_ID: ("Root", None, None)}
        self.edges = set()
        self.next_id = 1

    def new_node(self, kind, name, uid):
        nid = self.next_id
        self.next_id += 1
        self.values[nid] = (kind, name, uid)
        return nid

    def add_target(self, src, dst):
        self.edges.add((src, dst))

    def remove_target(self, src, dst):
        self.edges.discard((src, dst))

    def remove(self, node):
        self.edges = {(s, d) for (s, d) in self.edges if d != node}

    def set_value(self, node, kind, name, uid):
        self.values[node] = (kind, name, uid)

    def expected_index_count(self):
        """Rows emit_edge_index should produce for Root->Artist edges:
        marker + UID + Name + distinct search terms."""
        n = 0
        for s, d in self.edges:
            kind, name, uid = self.values[d]
            if s == ROOT_ID and kind == "Artist":
                n += 3 + len(set(name.split(" ")))
        return n


OPS = st.lists(
    st.tuples(
        st.sampled_from(["new", "remove_target", "remove", "set_value"]),
        st.integers(0, 6),  # node selector (mod live artists)
        st.sampled_from(["Neil Young", "Crazy Horse", "Tom", "A B C"]),
        st.integers(0, 99),
    ),
    min_size=1,
    max_size=6,
)


@pytest.mark.slow
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(OPS)
def test_engine_matches_sequential_model(spark, ops):
    model = PyGraph()
    session = GraphSession(GraphSnapshot.empty(spark, catalogue_schema()))
    live: list[int] = []

    def prog(tx):
        for op, sel, name, uid in ops:
            if op == "new" or not live:
                a = tx.new_node("Artist", name=name, uid=uid)
                m = model.new_node("Artist", name, uid)
                assert a == m, "id allocation must match the sequential model"
                tx.add_target(ROOT_ID, a)
                model.add_target(ROOT_ID, m)
                live.append(a)
            elif op == "remove_target":
                v = live[sel % len(live)]
                tx.remove_target(ROOT_ID, v)
                model.remove_target(ROOT_ID, v)
            elif op == "remove":
                v = live.pop(sel % len(live))
                tx.remove(v)
                model.remove(v)
            else:
                v = live[sel % len(live)]
                tx.set_value(v, "Artist", name=name, uid=uid)
                model.set_value(v, "Artist", name, uid)

    session.write(prog)
    snap = session.snapshot
    got_edges = {(r["src"], r["dst"]) for r in snap.edges.collect()}
    assert got_edges == model.edges
    got_vals = {
        r["id"]: (r["kind"], r["name"], r["uid"])
        for r in snap.vertices.filter("kind = 'Artist'").collect()
    }
    for nid, (kind, name, uid) in model.values.items():
        if kind == "Artist":
            assert got_vals[nid] == (kind, name, uid)
    assert snap.edge_index.count() == model.expected_index_count()
