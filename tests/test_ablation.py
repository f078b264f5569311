"""source_ablation — hand golden + identity properties."""

from decimal import ROUND_HALF_UP, Decimal


def _r6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))


_SCHEMA = "doc_id long, source string, lang string, n_chars long"


def test_ablation_hand_golden(spark):
    from careers_spark.operators.profiling import source_ablation

    rows = [
        (0, "A", "en", 100),
        (1, "A", "en", 300),
        (2, "B", "de", 200),
        (3, "B", "en", 400),
        (4, "C", "fr", 500),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = {r.source: r for r in source_ablation(df).collect()}
    # without A: 3 docs (de, en, fr), en 1/3, mean (200+400+500)/3
    a = got["A"]
    assert a.n_docs == 2 and a.share == 0.4
    assert a.en_share_without == _r6(1 / 3)
    assert a.mean_chars_without == _r6(1100 / 3)
    # full corpus: en 3/5 = .6, mean 300
    assert a.delta_en_share == _r6(_r6(1 / 3) - 0.6)
    assert a.delta_mean_chars == _r6(_r6(1100 / 3) - 300.0)


def test_ablation_sole_source_nulls(spark):
    from careers_spark.operators.profiling import source_ablation

    rows = [(0, "only", "en", 10), (1, "only", "de", 20)]
    got = source_ablation(spark.createDataFrame(rows, _SCHEMA)).collect()[0]
    assert got.share == 1.0
    assert got.en_share_without is None
    assert got.mean_chars_without is None


def test_ablation_neutral_source_zero_delta(spark):
    """Removing a source whose profile matches the rest exactly leaves
    both metrics unchanged."""
    from careers_spark.operators.profiling import source_ablation

    rows = [
        (0, "A", "en", 100),
        (1, "A", "de", 300),
        (2, "B", "en", 100),
        (3, "B", "de", 300),
    ]
    got = {r.source: r for r in source_ablation(spark.createDataFrame(rows, _SCHEMA)).collect()}
    assert got["A"].delta_en_share == 0.0
    assert got["A"].delta_mean_chars == 0.0
