"""Property-based differential test of SPARQL solution-multiset
semantics: the DataFrame compiler (query/sparql.py) vs an independent
brute-force evaluator over list-of-dict solutions.

The round-4 compatible-mapping join machinery (join-over-union
distribution, isnull-or-equal residuals, MINUS shared-domain rule) is
exactly the kind of code where a hand-picked example can pass while an
odd shape breaks — so this generates random graphs and random
group-pattern structures and requires multiset equality.

The oracle evaluator implements SPARQL 1.1 §18.5 algebra directly:
  Join(A,B)     = {merge(a,b) | a∈A, b∈B, compatible(a,b)}
  Union(A,B)    = bag concat
  LeftJoin(A,B) = Join ∪ {a | no compatible b}
  Minus(A,B)    = {a | ∄b: compatible(a,b) ∧ dom(a)∩dom(b)≠∅}
No Spark/DataFrame code is shared with the engine under test.
"""

from __future__ import annotations

import random

import pytest

from rdf_knowledge_extractor_spark.query.sparql import SparqlEngine

NS = "http://t.example/"


# -- independent reference evaluator ------------------------------------

def _compatible(a: dict, b: dict) -> bool:
    return all(a[k] == b[k] for k in a.keys() & b.keys())


def _join(A, B):
    return [
        {**a, **b} for a in A for b in B if _compatible(a, b)
    ]


def _left_join(A, B):
    out = []
    for a in A:
        matches = [{**a, **b} for b in B if _compatible(a, b)]
        out.extend(matches if matches else [a])
    return out


def _minus(A, B):
    return [
        a
        for a in A
        if not any(_compatible(a, b) and (a.keys() & b.keys()) for b in B)
    ]


def _eval_pattern(graph, pat):
    s, p, o = pat
    out = []
    for ts, tp, to in graph:
        binding = {}
        ok = True
        for term, val in ((s, ts), (p, tp), (o, to)):
            if term.startswith("?"):
                v = term[1:]
                if v in binding and binding[v] != val:
                    ok = False
                    break
                binding[v] = val
            elif term != val:
                ok = False
                break
        if ok:
            out.append(binding)
    return out


def _eval_group(graph, node):
    kind = node[0]
    if kind == "bgp":
        sols = [{}]
        for pat in node[1]:
            sols = _join(sols, _eval_pattern(graph, pat))
        return sols
    if kind == "join":
        return _join(_eval_group(graph, node[1]), _eval_group(graph, node[2]))
    if kind == "union":
        return _eval_group(graph, node[1]) + _eval_group(graph, node[2])
    if kind == "leftjoin":
        return _left_join(_eval_group(graph, node[1]), _eval_group(graph, node[2]))
    if kind == "minus":
        return _minus(_eval_group(graph, node[1]), _eval_group(graph, node[2]))
    raise AssertionError(node)


def _all_vars(node):
    if node[0] == "bgp":
        return {t[1:] for pat in node[1] for t in pat if t.startswith("?")}
    return _all_vars(node[1]) | _all_vars(node[2])


# -- random generation ---------------------------------------------------

_PREDS = [f"p{i}" for i in range(4)]
_NODES = [f"n{i}" for i in range(6)]
_VARS = ["a", "b", "c", "d"]


def _rand_graph(rng, n):
    return list(
        {
            (rng.choice(_NODES), NS + rng.choice(_PREDS), rng.choice(_NODES))
            for _ in range(n)
        }
    )


def _rand_pattern(rng):
    def term(allow_var=True):
        if allow_var and rng.random() < 0.6:
            return "?" + rng.choice(_VARS)
        return rng.choice(_NODES)

    return (term(), NS + rng.choice(_PREDS), term())


def _rand_group(rng, depth):
    if depth == 0 or rng.random() < 0.4:
        return ("bgp", [_rand_pattern(rng) for _ in range(rng.randint(1, 2))])
    op = rng.choice(["join", "union", "leftjoin", "minus"])
    return (op, _rand_group(rng, depth - 1), _rand_group(rng, depth - 1))


# -- algebra → engine query text -----------------------------------------

def _pat_text(pat):
    s, p, o = pat

    def t(x):
        return x if x.startswith("?") else f"<{x}>"

    return f"{t(s)} <{p}> {t(o)} ."


def _group_text(node):
    if node[0] == "bgp":
        return " ".join(_pat_text(p) for p in node[1])
    a, b = _group_text(node[1]), _group_text(node[2])
    if node[0] == "join":
        return f"{{ {a} }} {{ {b} }}"
    if node[0] == "union":
        return f"{{ {a} }} UNION {{ {b} }}"
    if node[0] == "leftjoin":
        return f"{{ {a} }} OPTIONAL {{ {b} }}"
    if node[0] == "minus":
        return f"{{ {a} }} MINUS {{ {b} }}"
    raise AssertionError(node)


def _multiset(rows, var_order):
    return sorted(
        tuple(r.get(v) for v in var_order) for r in rows
    )


@pytest.mark.parametrize("seed", range(40))
def test_random_group_patterns_match_reference_evaluator(spark, seed):
    rng = random.Random(seed)
    graph_rows = _rand_graph(rng, rng.randint(4, 10))
    node = _rand_group(rng, 2)

    # engine restrictions the generator must respect: the TOP level of
    # a WHERE clause treats a leading bare union-chain fine, but a
    # leftjoin/minus whose LEFT side is itself compiled first needs a
    # pattern — wrap everything as { left } OP { right } inside WHERE,
    # which parse_group handles via the union/optional/minus branches.
    qtext = "SELECT * WHERE { " + _group_text(node) + " }"

    expected = _eval_group(graph_rows, node)
    var_order = sorted(_all_vars(node))

    gdf = spark.createDataFrame(
        graph_rows, "subject string, predicate string, object string"
    )
    try:
        got_df = SparqlEngine(gdf).execute(qtext)
    except Exception as e:  # noqa: BLE001
        pytest.fail(f"engine rejected {qtext!r}: {e}")
    got_rows = [r.asDict() for r in got_df.collect()]

    got = _multiset(got_rows, var_order)
    want = _multiset(expected, var_order)
    assert got == want, (
        f"\nseed={seed}\ngraph={graph_rows}\nquery={qtext}\n"
        f"got={got}\nwant={want}"
    )
