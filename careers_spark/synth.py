"""Deterministic synthetic corpus: transcripts + dictionary + gold triples.

Mirrors the reference's test strategy of pinning extraction goldens to a
known corpus (reference: src/test/scala/data/parsetest.txt exercised by
testMRJobs.scala:168-323, and the 42-case shortPhrases.xml golden corpus,
testDisambiguator.scala:483-542): the generator *plants* surface forms at
known positions with known link targets, so the expected mention set and
the expected (subj, pred, obj) triple set are computable exactly.

Everything is a pure function of (seed, n_convs): per-conversation RNG is
seeded by (seed, conv_idx), so the output is identical at any parallelism
level / partitioning — that property is itself pytest-asserted (the
per-turn text-equality invariant from BASELINE.json input_hint).

Scale note: transcripts are generated distributed (spark.range ->
mapInPandas) so bench-scale corpora never bottleneck on the driver.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

import pandas as pd

from careers_spark import schema as S

# ---------------------------------------------------------------------------
# predicate rule set (the deterministic dependency-pattern spec: the gap
# tokens between two adjacent linked mentions, joined by spaces, must equal
# one of these keys exactly)
# ---------------------------------------------------------------------------
PRED_PATTERNS: dict[str, str] = {
    "works at": "works_at",
    "joined": "works_at",
    "is employed by": "works_at",
    "is located in": "located_in",
    "located in": "located_in",
    "is based in": "located_in",
    "is headquartered in": "located_in",
    "studied at": "studied_at",
    "study at": "studied_at",
    "graduated from": "studied_at",
    "founded": "founded",
    "uses": "uses",
    "acquired": "acquired",
}

EPOCH0 = 1700000000  # fixed corpus epoch (seconds)


def _nid(i: int) -> str:
    """Entity-id fragment with no 4-digit run: the reference's
    allowedContext date matcher rejects any context containing
    ``[0-9]{4}`` (Disambiguator.scala:74,99), and synth topics appear as
    contexts of each other — so ids are digit-chunked ('3x07' not
    '0307')."""
    return f"{i // 100}x{i % 100:02d}"


@dataclass
class Entity:
    topic: str  # canonical-form topic id, e.g. "Main:Org0x07 Corp"
    aliases: list[tuple[str, int]]  # (normalized surface, anchor count)
    contexts: list[str]


@dataclass
class Domain:
    idx: int
    cat: str  # Category:Domain{i}
    org: Entity
    person: Entity
    city: Entity
    univ: Entity
    # alias actually usable for the person in conv text (may be ambiguous)
    person_ambiguous_alias: str | None = None


@dataclass
class KB:
    entities: list[Entity] = field(default_factory=list)
    domains: list[Domain] = field(default_factory=list)
    redirects: list[tuple[str, str]] = field(default_factory=list)
    same_as: list[tuple[str, str]] = field(default_factory=list)
    extra_surface_forms: list[tuple[str, str, int]] = field(default_factory=list)

    def surface_forms_pdf(self) -> pd.DataFrame:
        rows = []
        for e in self.entities:
            for a, c in e.aliases:
                rows.append((a, e.topic, c))
        rows.extend(self.extra_surface_forms)
        return pd.DataFrame(rows, columns=["surface", "topic", "count"])

    def topic_contexts_pdf(self) -> pd.DataFrame:
        rows = []
        for e in self.entities:
            for c in e.contexts:
                rows.append((e.topic, c))
        return pd.DataFrame(rows, columns=["topic", "context"])

    def redirects_pdf(self) -> pd.DataFrame:
        return pd.DataFrame(self.redirects, columns=["from_topic", "to_topic"])

    def same_as_pdf(self) -> pd.DataFrame:
        return pd.DataFrame(self.same_as, columns=["a", "b"])

    def canonical_map(self) -> dict[str, str]:
        """Ground-truth canonicalization: redirect fixpoint + same_as CC.

        Used only to compute gold triples; the pipeline must reproduce it
        with DataFrame ops (operators.dictionary.resolve_redirects +
        operators.canonicalize.connected_components).
        """
        redir = dict(self.redirects)

        def resolve(t: str) -> str:
            seen = set()
            while t in redir and t not in seen:
                seen.add(t)
                t = redir[t]
            return t

        # union-find over same_as edges on redirect-resolved ids
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in self.same_as:
            ra, rb = find(resolve(a)), find(resolve(b))
            if ra != rb:
                lo, hi = sorted([ra, rb])
                parent[hi] = lo
        out: dict[str, str] = {}
        topics = {e.topic for e in self.entities}
        topics |= set(redir) | set(redir.values())
        topics |= {t for ab in self.same_as for t in ab}
        for t in topics:
            out[t] = find(resolve(t))
        return out


# ---------------------------------------------------------------------------
# hand-written core (golden) entities — the "rice / cheney / bush" style
# ambiguity cases from the reference golden corpus, re-planted
# ---------------------------------------------------------------------------
def _core_entities() -> list[Entity]:
    pol = ["Category:American politicians", "Category:Republicans"]
    return [
        Entity(
            "Main:Condoleezza Rice",
            [("condoleezza rice", 100), ("rice", 80), ("condi", 20)],
            pol + ["Main:George W. Bush"],
        ),
        Entity("Main:Rice", [("rice", 300)], ["Category:Cereals", "Category:Food"]),
        Entity(
            "Main:Rice University",
            [("rice university", 90), ("rice", 40)],
            ["Category:Universities", "Main:Houston"],
        ),
        Entity(
            "Main:George W. Bush",
            [("george w bush", 150), ("george bush", 60), ("bush", 120)],
            pol,
        ),
        Entity("Main:Bush", [("bush", 200)], ["Category:Plants"]),
        Entity("Main:Dick Cheney", [("dick cheney", 90), ("cheney", 70)], pol),
        Entity("Main:Donald Rumsfeld", [("donald rumsfeld", 50), ("rumsfeld", 40)], pol),
        Entity("Main:Houston", [("houston", 100)], ["Category:Cities"]),
        Entity(
            "Main:Cambridge",
            [("cambridge", 150)],
            ["Category:Cities", "Category:England"],
        ),
        Entity(
            "Main:University of Cambridge",
            [("university of cambridge", 120), ("cambridge university", 40)],
            ["Category:Universities", "Category:England"],
        ),
    ]


def build_kb(n_domains: int, seed: int = 42) -> KB:
    """Deterministic mini knowledge base with planted ambiguity + skew.

    - every 2k/2k+1 domain pair shares an ambiguous person alias
      ("smith{k}") with asymmetric anchor counts, so the prior alone picks
      the wrong entity in half the conversations — coherence must fix it;
    - city 0 ("metropolis") is a hub: ~30% of orgs are located there
      (hub-entity skew for the CC / edge aggregation path);
    - some surface forms target redirect topics (2-hop chains) and
      duplicate org topics linked by same_as — exercising fixpoint
      redirect resolution + connected-components canonicalization.
    """
    rng = random.Random(seed)
    kb = KB()
    kb.entities.extend(_core_entities())

    n_cities = max(3, n_domains // 4)
    cities: list[Entity] = []
    for j in range(n_cities):
        aliases = [(f"city{j}", 50 + (j % 7) * 10)]
        if j == 0:
            aliases.append(("metropolis", 400))
        e = Entity(f"Main:City{_nid(j)}", aliases, ["Category:Cities"])
        cities.append(e)
        kb.entities.append(e)
        univ = Entity(
            f"Main:University of City{_nid(j)}",
            [(f"university of city{j}", 40)],
            ["Category:Universities", e.topic],
        )
        kb.entities.append(univ)

    for i in range(n_domains):
        cat = f"Category:Domain{_nid(i)}"
        city_j = 0 if rng.random() < 0.3 else rng.randrange(n_cities)
        city = cities[city_j]
        org = Entity(
            f"Main:Org{_nid(i)} Corp",
            [(f"org{i} corp", 60), (f"org{i}", 30)],
            [cat, city.topic],
        )
        person = Entity(
            f"Main:Person{_nid(i)} Smith",
            [(f"person{i} smith", 40), (f"person{i}", 25)],
            [cat, org.topic],
        )
        kb.entities.append(org)
        kb.entities.append(person)

        # ambiguous shared surname between domain pairs (2k, 2k+1)
        k, parity = divmod(i, 2)
        if k < n_domains // 4:
            amb = f"smith{k}"
            # asymmetric counts: prior favors the even-domain person
            person.aliases.append((amb, 90 if parity == 0 else 15))
            domain_amb = amb
        else:
            domain_amb = None

        # redirect chains (some 2-hop) with surface forms targeting the
        # redirect topic — must resolve to the canonical org at dictionary
        # build time (reference TODO at BuildPhraseQueryDb.scala:155-156)
        if i % 3 == 0:
            kb.redirects.append((f"Main:The Org{_nid(i)}", org.topic))
            kb.extra_surface_forms.append((f"the org{i}", f"Main:The Org{_nid(i)}", 12))
            if i % 6 == 0:
                kb.redirects.append((f"Main:Org{_nid(i)} Inc", f"Main:The Org{_nid(i)}"))
                kb.extra_surface_forms.append(
                    (f"org{i} inc", f"Main:Org{_nid(i)} Inc", 8)
                )

        # duplicate org entity linked by same_as -> CC canonicalization
        if i % 4 == 0:
            dup = Entity(
                f"Main:Org{_nid(i)} Corporation",
                [(f"org{i} corporation", 10)],
                [cat],
            )
            kb.entities.append(dup)
            kb.same_as.append((dup.topic, org.topic))

        univ = next(
            e for e in kb.entities if e.topic == f"Main:University of City{_nid(city_j)}"
        )
        kb.domains.append(
            Domain(i, cat, org, person, city, univ, person_ambiguous_alias=domain_amb)
        )
    return kb


# ---------------------------------------------------------------------------
# conversation generator — pure function of (kb, conv_idx, seed)
# ---------------------------------------------------------------------------
_FILLER = (
    "ok thanks for the detail let me think about the roadmap and the general "
    "timeline before we continue with planning"
).split()


def _pick_alias(rng: random.Random, e: Entity, prefer: str | None = None) -> str:
    if prefer is not None and rng.random() < 0.5:
        return prefer
    return rng.choice(e.aliases)[0]


def gen_conv(
    kb_domains: list[Domain],
    canonical: dict[str, str],
    conv_idx: int,
    seed: int,
) -> tuple[list[tuple], list[tuple]]:
    """Generate one conversation: (turn rows, gold triple rows).

    turn rows: (conv_id, turn_idx, role, text, tool, ts_epoch)
    gold rows: (conv_id, turn_idx, subj, pred, obj)  [canonical ids]
    """
    rng = random.Random((seed << 20) ^ conv_idx)
    d = kb_domains[conv_idx % len(kb_domains)]
    conv_id = f"conv{conv_idx:08d}"
    turns: list[tuple] = []
    gold: list[tuple] = []

    def add_turn(role: str, text: str, tool: str = "") -> int:
        ti = len(turns)
        # hour offset wraps at 1M convs: unbounded conv_idx*3600 exceeds
        # pandas' ns-timestamp range (year 2262) past ~3.4M conversations
        turns.append(
            (conv_id, ti, role, text, tool,
             EPOCH0 + (conv_idx % 1_000_000) * 3600 + ti * 60)
        )
        return ti

    def filler(n: int) -> str:
        return " ".join(rng.choice(_FILLER) for _ in range(n))

    org_a = _pick_alias(rng, d.org)
    can = lambda t: canonical.get(t, t)  # noqa: E731

    add_turn("user", f"hello can you tell me about {org_a} and its team")

    # fact 1: person works_at org (sometimes via the ambiguous surname)
    person_a = _pick_alias(rng, d.person, prefer=d.person_ambiguous_alias)
    ti = add_turn("assistant", f"sure {person_a} works at {org_a} these days")
    gold.append((conv_id, ti, can(d.person.topic), "works_at", can(d.org.topic)))

    # fact 2: org located_in city (70%)
    if rng.random() < 0.7:
        city_a = _pick_alias(rng, d.city)
        ti = add_turn("assistant", f"{org_a} is located in {city_a} right now")
        gold.append((conv_id, ti, can(d.org.topic), "located_in", can(d.city.topic)))

    # fact 3: person studied_at university (50%) — overlap-site case:
    # "university of cityN" contains the city alias "cityN"
    if rng.random() < 0.5:
        univ_a = d.univ.aliases[0][0]
        ti = add_turn("user", f"and {person_a} studied at {univ_a} i believe")
        gold.append((conv_id, ti, can(d.person.topic), "studied_at", can(d.univ.topic)))

    # noise / tool turns (no triples)
    if rng.random() < 0.6:
        add_turn("user", filler(rng.randrange(5, 12)))
    if rng.random() < 0.3:
        add_turn("tool", f"search results for {org_a} {filler(4)}", tool="search")

    return turns, gold


# long-conversation profile (r4 verdict #4): conversation lengths cycle
# through this schedule by conv_idx, so a corpus mixes mid-size windows
# (dense-path threshold region), large windows, and cap-exceeding
# conversations that exercise _conv_windows turn-aligned splitting
LONG_TURN_CYCLE = (120, 300, 600, 1500)


def gen_long_conv(
    kb_domains: list[Domain],
    canonical: dict[str, str],
    conv_idx: int,
    seed: int,
    n_turns: int,
) -> tuple[list[tuple], list[tuple]]:
    """One LONG conversation: the same fact-sentence templates as
    gen_conv (so the same dictionary/automaton applies) cycled for
    n_turns turns. At ~1-3 candidate rows per fact turn this puts whole
    conversations into the dense resolver regime (windows >= 192
    candidate rows; >3000 rows split into turn-aligned coherence
    windows), which the short-conversation bench corpus never reaches
    (r4: p50=3 rows/conv)."""
    rng = random.Random((seed << 21) ^ (conv_idx * 2654435761 % (1 << 31)))
    d = kb_domains[conv_idx % len(kb_domains)]
    conv_id = f"lconv{conv_idx:08d}"
    turns: list[tuple] = []
    gold: list[tuple] = []

    def add_turn(role: str, text: str, tool: str = "") -> int:
        ti = len(turns)
        turns.append(
            (conv_id, ti, role, text, tool,
             EPOCH0 + (conv_idx % 1_000_000) * 3600 + ti * 60)
        )
        return ti

    def filler(n: int) -> str:
        return " ".join(rng.choice(_FILLER) for _ in range(n))

    can = lambda t: canonical.get(t, t)  # noqa: E731
    add_turn("user", f"hello can you tell me about {_pick_alias(rng, d.org)} and its team")
    while len(turns) < n_turns:
        r = rng.random()
        person_a = _pick_alias(rng, d.person, prefer=d.person_ambiguous_alias)
        org_a = _pick_alias(rng, d.org)
        if r < 0.45:
            ti = add_turn(
                "assistant", f"sure {person_a} works at {org_a} these days"
            )
            gold.append(
                (conv_id, ti, can(d.person.topic), "works_at", can(d.org.topic))
            )
        elif r < 0.70:
            city_a = _pick_alias(rng, d.city)
            ti = add_turn(
                "assistant", f"{org_a} is located in {city_a} right now"
            )
            gold.append(
                (conv_id, ti, can(d.org.topic), "located_in", can(d.city.topic))
            )
        elif r < 0.85:
            univ_a = d.univ.aliases[0][0]
            ti = add_turn(
                "user", f"and {person_a} studied at {univ_a} i believe"
            )
            gold.append(
                (conv_id, ti, can(d.person.topic), "studied_at", can(d.univ.topic))
            )
        elif r < 0.95:
            add_turn("user", filler(rng.randrange(5, 12)))
        else:
            add_turn("tool", f"search results for {org_a} {filler(4)}", tool="search")
    return turns, gold


def gen_long_transcripts(
    spark,
    kb: KB,
    n_convs: int,
    seed: int = 42,
    parallelism: int | None = None,
    turn_cycle: tuple[int, ...] = LONG_TURN_CYCLE,
):
    """Distributed long-conversation corpus — same determinism contract
    as gen_transcripts (RNG keyed on conv_idx, not partition)."""
    domains = kb.domains
    canonical = kb.canonical_map()
    bc = spark.sparkContext.broadcast((domains, canonical, seed, turn_cycle))

    def gen(batches):
        doms, canon, sd, cyc = bc.value
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                t, _ = gen_long_conv(doms, canon, int(i), sd, cyc[int(i) % len(cyc)])
                rows.extend(t)
            yield _turns_to_pdf(rows)

    n_parts = parallelism or spark.sparkContext.defaultParallelism
    return (
        spark.range(0, n_convs, numPartitions=n_parts)
        .mapInPandas(gen, schema=S.TRANSCRIPTS)
    )


def gen_long_expected_triples(spark, kb: KB, n_convs: int, seed: int = 42,
                              turn_cycle: tuple[int, ...] = LONG_TURN_CYCLE):
    domains = kb.domains
    canonical = kb.canonical_map()
    bc = spark.sparkContext.broadcast((domains, canonical, seed, turn_cycle))

    def gen(batches):
        doms, canon, sd, cyc = bc.value
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                _, g = gen_long_conv(doms, canon, int(i), sd, cyc[int(i) % len(cyc)])
                rows.extend(g)
            out = pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
            )
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return spark.range(0, n_convs).mapInPandas(gen, schema=S.TRIPLES)


# ---------------------------------------------------------------------------
# Spark-facing constructors
# ---------------------------------------------------------------------------
def gen_transcripts_pdf(kb: KB, n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side tiny corpora (unit tests)."""
    canonical = kb.canonical_map()
    rows = []
    for i in range(n_convs):
        t, _ = gen_conv(kb.domains, canonical, i, seed)
        rows.extend(t)
    return _turns_to_pdf(rows)


def gen_expected_triples_pdf(kb: KB, n_convs: int, seed: int = 42) -> pd.DataFrame:
    canonical = kb.canonical_map()
    rows = []
    for i in range(n_convs):
        _, g = gen_conv(kb.domains, canonical, i, seed)
        rows.extend(g)
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"])


def _turns_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts_epoch"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf.pop("ts_epoch"), unit="s")
    return pdf


def gen_transcripts(spark, kb: KB, n_convs: int, seed: int = 42, parallelism: int | None = None):
    """Distributed generation: spark.range -> mapInPandas, per-conv seeded.

    Deterministic under any partitioning (RNG keyed on conv_idx, not on
    partition), so the same corpus materializes at local[8] and local[32].
    """
    domains = kb.domains
    canonical = kb.canonical_map()
    bc = spark.sparkContext.broadcast((domains, canonical, seed))

    def gen(batches):
        doms, canon, sd = bc.value
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                t, _ = gen_conv(doms, canon, int(i), sd)
                rows.extend(t)
            yield _turns_to_pdf(rows)

    n_parts = parallelism or spark.sparkContext.defaultParallelism
    return (
        spark.range(0, n_convs, numPartitions=n_parts)
        .mapInPandas(gen, schema=S.TRANSCRIPTS)
    )


def gen_expected_triples(spark, kb: KB, n_convs: int, seed: int = 42):
    domains = kb.domains
    canonical = kb.canonical_map()
    bc = spark.sparkContext.broadcast((domains, canonical, seed))

    def gen(batches):
        doms, canon, sd = bc.value
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                _, g = gen_conv(doms, canon, int(i), sd)
                rows.extend(g)
            out = pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "subj", "pred", "obj"]
            )
            out["turn_idx"] = out["turn_idx"].astype("int32")
            yield out

    return spark.range(0, n_convs).mapInPandas(gen, schema=S.TRIPLES)


def kb_tables(spark, kb: KB):
    """Dictionary tables as DataFrames (the raw, pre-build inputs)."""
    return {
        "surface_forms_raw": spark.createDataFrame(
            kb.surface_forms_pdf(), schema=S.SURFACE_FORMS
        ),
        "topic_contexts": spark.createDataFrame(
            kb.topic_contexts_pdf(), schema=S.TOPIC_CONTEXTS
        ),
        "redirects": spark.createDataFrame(kb.redirects_pdf(), schema=S.REDIRECTS),
        "same_as": spark.createDataFrame(
            kb.same_as_pdf(), schema="a string, b string"
        ),
    }
