"""Property-based fuzz of the reconcile path (VERDICT r4 item 7).

Reconciliation (models/factor_graph.py reconcile_graphs) is
correctness-critical: a wrong uuid_map silently loads saved parameters
into the wrong variables. The hand-built-graph tests cover the common
shapes; this fuzz generates randomized factor graphs — mixed
named/unnamed nodes, random operator chains, parallel same-label edges
(one variable feeding several operators) — builds each graph TWICE
from the same seed (isomorphic structure, fresh uuids), round-trips
the first through the JSON skeleton, reconciles onto the second, and
asserts:

- the uuid_map is injective (no two previous nodes collapse onto one
  current node) and total (every previous node is matched), AND
- it is a true edge-preserving isomorphism (every labeled edge maps to
  an identically labeled edge) with names preserved,
- OR the documented ambiguity warning fired for that seed (parallel
  unnamed same-label candidates pair positionally — reference contract:
  /root/reference/mxfusion/models/factor_graph.py:479-590, where the
  same limitation is a TODO).

Identical construction order means positional pairing still yields the
correct isomorphism here, so in practice the strong assertions hold for
every seed; the warning escape hatch only relaxes the NAME checks,
never injectivity.
"""
import random
import warnings

import pytest

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal, Gamma, Beta
from mxfusion_tpu.components.functions.operators import (
    add, multiply, broadcast_to, square, exp)
from mxfusion_tpu.models.factor_graph import FactorGraph


def _build_random_model(seed):
    """Deterministic-from-seed random model: same seed -> isomorphic
    graph with fresh uuids each call."""
    rng = random.Random(seed)
    m = Model()
    pool = []

    n_roots = rng.randint(1, 3)
    for i in range(n_roots):
        v = Variable(shape=(1,))
        # every weakly-connected component must hold >=1 named seed for
        # reconcile's BFS to reach it: name all roots
        setattr(m, "root%d" % i, v)
        pool.append(getattr(m, "root%d" % i))

    n_steps = rng.randint(3, 10)
    for i in range(n_steps):
        kind = rng.random()
        if kind < 0.35:
            v = Normal.define_variable(
                mean=rng.choice(pool), variance=rng.choice(pool),
                shape=(1,))
        elif kind < 0.5:
            v = Gamma.define_variable(
                alpha=rng.choice(pool), beta=rng.choice(pool),
                shape=(1,))
        elif kind < 0.6:
            v = Beta.define_variable(
                alpha=rng.choice(pool), beta=rng.choice(pool),
                shape=(1,))
        elif kind < 0.75:
            v = add(rng.choice(pool), rng.choice(pool))
        elif kind < 0.85:
            v = multiply(rng.choice(pool), rng.choice(pool))
        elif kind < 0.95:
            v = square(rng.choice(pool)) if rng.random() < 0.5 \
                else exp(rng.choice(pool))
        else:
            v = broadcast_to(rng.choice(pool), (4, 1))
        if rng.random() < 0.4:
            setattr(m, "v%d" % i, v)
            pool.append(getattr(m, "v%d" % i))
        else:
            # unnamed: attach to the graph through an observation-like
            # named consumer later or leave dangling-but-connected
            m._extra = getattr(m, "_extra", [])
            pool.append(v)
    # make sure every node is attached to the model graph: wrap the
    # final pool tail in a named observed variable
    tail = pool[-1]
    m.y = Normal.define_variable(
        mean=tail, variance=broadcast_to(Variable(value=1.0), (1,)),
        shape=(1,))
    return m


def _edges(graph):
    return [(u.uuid, v.uuid, k)
            for u, v, k in graph.components_graph.edges(keys=True)]


@pytest.mark.parametrize("chunk", range(4))
def test_reconcile_random_graphs_bijective_isomorphism(chunk):
    """100 random graphs (25 per chunk), each: build twice from one
    seed, JSON round-trip, reconcile, assert bijection + isomorphism
    (or the ambiguity warning fired)."""
    for seed in range(chunk * 25, (chunk + 1) * 25):
        prev = _build_random_model(seed)
        cur = _build_random_model(seed)

        skeletons = FactorGraph.load_graphs_json([prev.as_json()])
        with warnings.catch_warnings(record=True) as wlist:
            warnings.simplefilter("always")
            uuid_map = FactorGraph.reconcile_graphs(
                current_graphs=[cur],
                primary_previous_graph=skeletons[0])
        ambiguous = any("reconcile" in str(w.message) for w in wlist)

        prev_uuids = {c.uuid for c in prev.components_graph.nodes}
        cur_uuids = {c.uuid for c in cur.components_graph.nodes}

        # injectivity: never map two previous nodes onto one current
        mapped = [uuid_map[u] for u in prev_uuids if u in uuid_map]
        assert len(mapped) == len(set(mapped)), \
            "seed %d: uuid_map not injective" % seed
        assert set(mapped) <= cur_uuids, \
            "seed %d: mapped onto unknown uuids" % seed

        # totality: every previous node found a counterpart
        missing = prev_uuids - set(uuid_map)
        assert not missing, \
            "seed %d: %d unmatched nodes (ambiguous=%s)" % (
                seed, len(missing), ambiguous)

        # name preservation (identical build order -> same names)
        prev_names = {c.uuid: c.name
                      for c in prev.components_graph.nodes}
        cur_names = {c.uuid: c.name for c in cur.components_graph.nodes}
        for pu, cu in uuid_map.items():
            if pu in prev_names:
                assert prev_names[pu] == cur_names[cu], \
                    "seed %d: name mismatch %s -> %s" % (
                        seed, prev_names[pu], cur_names[cu])

        # edge-preserving isomorphism: every labeled previous edge maps
        # to an identically labeled current edge (skip when the
        # documented positional-ambiguity warning fired)
        if not ambiguous:
            cur_edge_set = set(_edges(cur))
            for (u, v, k) in _edges(prev):
                assert (uuid_map[u], uuid_map[v], k) in cur_edge_set, \
                    "seed %d: edge (%s)-[%s]->(%s) not preserved" % (
                        seed, u, k, v)


def test_reconcile_ambiguity_warning_fires_on_parallel_unnamed():
    """Deliberate ambiguity: one named variable feeding two unnamed
    same-operator consumers through identically labeled edges must
    trigger the positional-pairing warning (and still produce an
    injective map)."""
    def build():
        m = Model()
        m.x = Variable(shape=(1,))
        a = exp(m.x)     # unnamed
        b = exp(m.x)     # unnamed, same label structure
        m.y = Normal.define_variable(mean=add(a, b),
                                     variance=broadcast_to(
                                         Variable(value=1.0), (1,)),
                                     shape=(1,))
        return m

    prev, cur = build(), build()
    skeletons = FactorGraph.load_graphs_json([prev.as_json()])
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        uuid_map = FactorGraph.reconcile_graphs(
            current_graphs=[cur], primary_previous_graph=skeletons[0])
    assert any("reconcile" in str(w.message) for w in wlist)
    mapped = list(uuid_map.values())
    assert len(mapped) == len(set(mapped))
