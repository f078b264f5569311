"""Hypothesis properties for the session-15 operator family, stated
over the pure-python lockstep twins that the per-operator tests prove
equal to the Spark implementations (test_preference.py::
test_bt_python_lockstep, test_wl.py::test_wl_python_lockstep_*,
test_lateness.py::test_lateness_python_lockstep). No Spark session
needed."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st


# --- Bradley-Terry MM twin (test_preference.py's _bt_python) ----------
def _bt(win_pairs, iterations=8, precision=10):
    wins = {}
    for w, l in win_pairs:
        if w == l:
            continue
        wins[(w, l)] = wins.get((w, l), 0) + 1
    ntot = {}
    for (i, j), n in wins.items():
        ntot[(i, j)] = ntot.get((i, j), 0) + n
        ntot[(j, i)] = ntot.get((j, i), 0) + n
    arms = sorted({i for i, _ in ntot})
    if not arms:
        return {}
    W = {a: 0 for a in arms}
    for (i, _), n in wins.items():
        W[i] += n
    w = {a: round(1.0 / len(arms), precision) for a in arms}
    for _ in range(iterations):
        raw = {}
        for i in arms:
            if W[i] == 0:
                raw[i] = 0.0
                continue
            den = sum(
                n / (w[i] + w[j]) for (ii, j), n in ntot.items() if ii == i
            )
            raw[i] = W[i] / den
        s = sum(raw.values())
        w = {a: round(raw[a] / s, precision) for a in arms}
    return w


pairs_strategy = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 4)).filter(
        lambda t: t[0] != t[1]
    ),
    min_size=1,
    max_size=60,
)


@given(pairs_strategy)
@settings(max_examples=150, deadline=None)
def test_bt_strengths_form_a_distribution(pairs):
    w = _bt(pairs)
    assert all(v >= 0 for v in w.values())
    assert abs(sum(w.values()) - 1.0) < 1e-6


@given(pairs_strategy, st.randoms())
@settings(max_examples=100, deadline=None)
def test_bt_comparison_order_invariance(pairs, rng):
    shuffled = list(pairs)
    rng.shuffle(shuffled)
    assert _bt(pairs) == _bt(shuffled)


@given(pairs_strategy)
@settings(max_examples=100, deadline=None)
def test_bt_relabel_equivariance(pairs):
    w = _bt(pairs)
    relabeled = [(a + 10, b + 10) for a, b in pairs]
    w2 = _bt(relabeled)
    assert {k + 10: v for k, v in w.items()} == w2


# --- WL refinement twin (test_wl.py's _wl_python) ---------------------
def _wl_labels(edges, rounds=3):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wl = {v: "0" for v in adj}
    history = [dict(wl)]
    for _ in range(rounds):
        wl = {
            v: hashlib.md5(
                (
                    wl[v] + "|" + ",".join(sorted(wl[u] for u in adj[v]))
                ).encode()
            ).hexdigest()
            for v in adj
        }
        history.append(dict(wl))
    return history


edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda t: t[0] != t[1]
    ),
    min_size=1,
    max_size=20,
)


@given(edges_strategy)
@settings(max_examples=150, deadline=None)
def test_wl_rounds_refine_the_partition(edges):
    """Color classes at round t+1 are a refinement of round t: two
    nodes separated once never merge again."""
    hist = _wl_labels(edges)
    nodes = list(hist[0])
    for t in range(len(hist) - 1):
        for a in nodes:
            for b in nodes:
                if hist[t][a] != hist[t][b]:
                    assert hist[t + 1][a] != hist[t + 1][b]


@given(edges_strategy)
@settings(max_examples=100, deadline=None)
def test_wl_relabel_equivariance(edges):
    """Renaming nodes permutes classes but preserves class sizes."""
    hist = _wl_labels(edges)
    ren = [(a + 100, b + 100) for a, b in edges]
    hist2 = _wl_labels(ren)
    for t in range(len(hist)):
        sizes = sorted(
            sum(1 for v in hist[t] if hist[t][v] == c)
            for c in set(hist[t].values())
        )
        sizes2 = sorted(
            sum(1 for v in hist2[t] if hist2[t][v] == c)
            for c in set(hist2[t].values())
        )
        assert sizes == sizes2


# --- lateness frontier twin (test_lateness.py lockstep) ---------------
def _lateness(rows, bucket_s=3600):
    mx = {}
    for ev, arr in rows:
        hr = arr // bucket_s
        mx[hr] = max(mx.get(hr, 0), ev)
    out = []
    for ev, arr in rows:
        hr = arr // bucket_s
        prior = [m for h, m in mx.items() if h < hr]
        f = max(prior) if prior else None
        out.append(f - ev if f is not None and f > ev else 0)
    return sorted(out)


events_strategy = st.lists(
    st.tuples(st.integers(0, 50000), st.integers(0, 5000)).map(
        lambda t: (t[0], t[0] + t[1])  # arrival never precedes event
    ),
    min_size=1,
    max_size=80,
)


@given(events_strategy)
@settings(max_examples=150, deadline=None)
def test_lateness_shift_invariance(rows):
    """Shifting the whole stream by any whole number of buckets leaves
    every lateness unchanged (the frontier is relative)."""
    shift = 7 * 3600
    shifted = [(ev + shift, arr + shift) for ev, arr in rows]
    assert _lateness(rows) == _lateness(shifted)


@given(events_strategy, st.randoms())
@settings(max_examples=100, deadline=None)
def test_lateness_row_order_invariance(rows, rng):
    shuffled = list(rows)
    rng.shuffle(shuffled)
    assert _lateness(rows) == _lateness(shuffled)


@given(events_strategy)
@settings(max_examples=100, deadline=None)
def test_lateness_in_order_stream_is_zero(rows):
    """If arrival order equals event order (arr == ev), nothing is
    late: the frontier of earlier buckets can never exceed the event
    time of a later-bucket event."""
    ordered = [(ev, ev) for ev, _ in rows]
    assert set(_lateness(ordered)) <= {0}
