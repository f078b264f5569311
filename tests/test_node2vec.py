"""node2vec_walks — structure goldens and a full python replay."""

import hashlib

import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _h64(key):
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def _replay(pairs, n_walks, walk_len, w_ret, w_bfs1, w_far, salt):
    """Literal python re-execution of the derandomized second-order
    walk: v-ordered candidates, cumulative intervals, md5 pick."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for start in adj:
        for j in range(n_walks):
            prev, cur = start, start
            rows.append((start, j, 0, start))
            for t in range(1, walk_len + 1):
                cands = sorted(adj[cur])
                ws = [
                    w_ret
                    if x == prev
                    else (w_bfs1 if x in adj.get(prev, ()) else w_far)
                    for x in cands
                ]
                r = _h64(f"{start}|{j}|{t}|{salt}") % sum(ws)
                cum = 0
                for x, w in zip(cands, ws):
                    cum += w
                    if r < cum:
                        prev, cur = cur, x
                        break
                rows.append((start, j, t, cur))
    return sorted(rows)


def test_node2vec_first_step_ignores_pq_weights(spark):
    """At t=1 prev==start, so every candidate is a neighbor of prev
    and all weights are w_bfs1 — two wildly different (w_ret, w_far)
    settings must pick the identical first-step node."""
    from careers_spark.operators.graph import node2vec_walks

    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c")]
    a = node2vec_walks(
        _edges(spark, pairs), walk_len=1, w_ret=1, w_bfs1=4, w_far=2
    )
    b = node2vec_walks(
        _edges(spark, pairs), walk_len=1, w_ret=999, w_bfs1=4, w_far=1
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_node2vec_full_python_replay(spark):
    """Every (start, j, step, node) row equals the literal python
    replay on a graph with genuine return / triangle / far choices."""
    from careers_spark.operators.graph import node2vec_walks

    # two triangles bridged by one edge, plus a pendant — exercises
    # all three weight classes at interior steps
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),
        ("c", "d"),
        ("d", "e"), ("e", "f"), ("d", "f"),
        ("f", "g"),
    ]
    got = sorted(
        map(
            tuple,
            node2vec_walks(
                _edges(spark, pairs),
                n_walks=2,
                walk_len=4,
                w_ret=1,
                w_bfs1=4,
                w_far=2,
                salt="n2v",
            ).collect(),
        )
    )
    want = _replay(pairs, 2, 4, 1, 4, 2, "n2v")
    assert got == want


def test_node2vec_walk_shape_and_continuity(spark):
    """Each (start, j) emits exactly walk_len+1 steps, step 0 is the
    start, and consecutive steps are joined by a real edge."""
    from careers_spark.operators.graph import node2vec_walks

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    rows = node2vec_walks(
        _edges(spark, pairs), n_walks=2, walk_len=3
    ).collect()
    adj = set()
    for x, y in pairs:
        adj |= {(x, y), (y, x)}
    walks = {}
    for r in rows:
        walks.setdefault((r["start"], r["j"]), {})[r["step"]] = r["node"]
    assert len(walks) == 4 * 2
    for (start, _j), bystep in walks.items():
        assert sorted(bystep) == [0, 1, 2, 3]
        assert bystep[0] == start
        for t in range(1, 4):
            assert (bystep[t - 1], bystep[t]) in adj


def test_node2vec_weight_validation(spark):
    from careers_spark.operators.graph import node2vec_walks

    with pytest.raises(ValueError):
        node2vec_walks(_edges(spark, [("a", "b")]), w_far=0)
