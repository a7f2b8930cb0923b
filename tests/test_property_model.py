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


# -- batched BPE fit: exact-mode equality property ---------------------------
#
# The distributed fit's batched rounds claim bit-identical merges to the
# sequential argmax loop (operators/bpe._select_merge_batch's proof).
# This drives the SAME selector + the same merge fold through a pure-
# Python simulation of the batched loop against the reference sequential
# fit over adversarial corpora (tiny alphabets maximize symbol sharing,
# tie collisions, and concat/token-string collisions — the exact hazards
# the selector's guards exist for).

@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=6),  # batch cap
)
def test_batched_bpe_selection_equals_sequential(word_freqs, cap):
    from graph_db_spark.operators.bpe import _fit_bpe_local, _select_merge_batch

    n_merges = 12
    expected = _fit_bpe_local(list(word_freqs), n_merges)

    # pure-Python simulation of fit_bpe's distributed batched loop:
    # count pairs -> select a safe batch -> apply the batch's merges
    state = [(list(w), n) for w, n in word_freqs]
    merges = []
    guard = 0
    while len(merges) < n_merges:
        guard += 1
        assert guard <= 200, "batched loop failed to converge"
        counts = {}
        for syms, n in state:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        rows = sorted(
            ((a, b, c) for (a, b), c in counts.items()),
            key=lambda r: (-r[2], r[0], r[1]),
        )
        batch = _select_merge_batch(
            rows, min(cap, n_merges - len(merges)), {x + y for x, y in merges}
        )
        assert batch, "selector must always accept at least the head"
        merges.extend(batch)
        for a, b in batch:
            new_state = []
            for syms, n in state:
                acc = []
                for s in syms:
                    if acc and acc[-1] == a and s == b:
                        acc[-1] = a + b
                    else:
                        acc.append(s)
                new_state.append((acc, n))
            state = new_state

    assert merges == expected


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=6),  # batch cap
)
def test_greedy_bpe_selection_contract(word_freqs, cap):
    """Greedy batching (``batch_mode="greedy"`` / exact=False) trades the
    sequential-equality guarantee for round-count; its DEVIATION is
    bounded by contract, property-checked over the same adversarial
    corpora as the exact proof: every round's batch (i) is headed by the
    sequential argmax pair, (ii) contains the exact-mode batch as a
    subset (greedy only ever accepts MORE — the conflict predicate is
    identical up to exact's early stops and count trim), (iii) is
    mutually non-interacting including existing token strings, (iv)
    respects the cap; and the finished fit is deterministic,
    duplicate-free, and constructible (every operand is a single char or
    an earlier rule's concat) — so the learned rules are always a valid
    tokenizer even where their order deviates (round-7 verdict item 3)."""
    from graph_db_spark.operators.bpe import _select_merge_batch

    n_merges = 12

    def run_greedy():
        state = [(list(w), n) for w, n in word_freqs]
        merges = []
        guard = 0
        while len(merges) < n_merges:
            guard += 1
            assert guard <= 200, "greedy loop failed to converge"
            counts = {}
            for syms, n in state:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + n
            if not counts:
                break
            rows = sorted(
                ((a, b, c) for (a, b), c in counts.items()),
                key=lambda r: (-r[2], r[0], r[1]),
            )
            round_cap = min(cap, n_merges - len(merges))
            known = {x + y for x, y in merges}
            batch = _select_merge_batch(rows, round_cap, known, exact=False)
            # (i) headed by the sequential argmax pair
            assert batch and batch[0] == (rows[0][0], rows[0][1])
            # (ii) exact-mode batch ⊆ greedy batch
            exact_batch = _select_merge_batch(rows, round_cap, known, exact=True)
            assert set(exact_batch) <= set(batch)
            # (iii) mutually non-interacting, incl. existing tokens
            used = set()
            for a, b in batch:
                assert not ({a, b, a + b} & used)
                assert (a + b) not in known or (a, b) == batch[0]
                used.update((a, b, a + b))
            # (iv) cap respected
            assert len(batch) <= round_cap
            merges.extend(batch)
            for a, b in batch:
                new_state = []
                for syms, n in state:
                    acc = []
                    for s in syms:
                        if acc and acc[-1] == a and s == b:
                            acc[-1] = a + b
                        else:
                            acc.append(s)
                    new_state.append((acc, n))
                state = new_state
        return merges

    merges = run_greedy()
    # deterministic
    assert run_greedy() == merges
    # duplicate-free rules, constructible operands
    built = set()
    for a, b in merges:
        assert all(len(s) == 1 or s in built for s in (a, b))
        assert (a + b) not in built
        built.add(a + b)
