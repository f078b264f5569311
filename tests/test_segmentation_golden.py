"""The reference's segmentation-alternatives golden, ported VERBATIM
(testDisambiguator.scala:565-630 'Disambiguation alternative
generation'): the word stream 'covent garden barack hussein obama
design pattern language about a boy' with its 17 surface-form spans
must group into exactly 4 ambiguity sites with exactly the listed
maximal non-overlapping alternatives. Pure-python (no Spark session):
exercises coherence._build_sites + coherence._alternatives directly."""

from careers_spark.operators import coherence as CO

WORDS = "covent garden barack hussein obama design pattern language about a boy".split()

# (start, end) token spans — the reference's sfs list, same order
SFS = [
    (0, 0), (0, 1), (1, 1),
    (2, 2), (2, 3), (2, 4), (3, 3), (3, 4), (4, 4),
    (5, 5), (5, 6), (6, 6), (6, 7), (7, 7),
    (8, 8), (8, 10), (10, 10),
]


def _site_alternatives():
    spans = [(0, s, e) for s, e in SFS]  # single turn
    sites = CO._build_sites(spans)
    out = []
    for site in sorted(sites, key=lambda st: min(spans[i][1] for i in st)):
        alts = CO._alternatives(site, spans)
        words_alts = {
            tuple(
                " ".join(WORDS[spans[i][1]: spans[i][2] + 1])
                for i in sorted(alt, key=lambda i: spans[i][1])
            )
            for alt in alts
        }
        bounds = (
            min(spans[i][1] for i in site),
            max(spans[i][2] for i in site),
        )
        out.append((bounds, words_alts))
    return out


def test_four_sites_with_reference_bounds():
    got = _site_alternatives()
    assert [b for b, _ in got] == [(0, 1), (2, 4), (5, 7), (8, 10)]


def test_site_alternatives_match_reference_exactly():
    got = dict(_site_alternatives())
    assert got[(0, 1)] == {
        ("covent", "garden"),
        ("covent garden",),
    }
    assert got[(2, 4)] == {
        ("barack", "hussein", "obama"),
        ("barack", "hussein obama"),
        ("barack hussein", "obama"),
        ("barack hussein obama",),
    }
    assert got[(5, 7)] == {
        ("design", "pattern", "language"),
        ("design", "pattern language"),
        ("design pattern", "language"),
    }
    assert got[(8, 10)] == {
        ("about", "boy"),
        ("about a boy",),
    }
