"""The end-to-end KG-construction pipeline with checkpointed, resumable
stage boundaries and per-partition lineage.

The reference resumes work with max-id cursors in a polling loop
(reference: applications/WebCVProcess.scala:213-298); at 10^12-turn batch
scale the equivalent is *stage checkpointing*: every stage materializes
to a partitioned table, records per-file lineage rows (stage, file,
rows), and drops a `_DONE.json` marker with row counts + wall time. A
re-run with the same work_dir skips completed stages (resume), so an
executor-loss or OOM mid-pipeline costs one stage, not the run.

Locally the tables are parquet; `sources.catalog.Catalog` swaps in
Iceberg (`writeTo(...).append()`) when a runtime jar is on the
classpath — the stage protocol is identical.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from careers_spark.operators import canonicalize as CZ
from careers_spark.operators import coherence as CO
from careers_spark.operators import dictionary as D
from careers_spark.operators import graph as G
from careers_spark.operators import linking as L
from careers_spark.operators import mentions as M


@dataclass
class StageResult:
    name: str
    rows: int
    wall_s: float
    resumed: bool


@dataclass
class PipelineRun:
    outputs: dict[str, DataFrame] = field(default_factory=dict)
    stages: list[StageResult] = field(default_factory=list)

    def metrics(self) -> dict:
        return {
            s.name: {"rows": s.rows, "wall_s": round(s.wall_s, 3), "resumed": s.resumed}
            for s in self.stages
        }


class KGPipeline:
    def __init__(self, spark: SparkSession, work_dir: str):
        self.spark = spark
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)

    # -- stage protocol -----------------------------------------------------
    def _marker(self, name: str) -> str:
        return os.path.join(self.work_dir, name, "_DONE.json")

    def stage(
        self,
        run: PipelineRun,
        name: str,
        compute,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        out_dir = os.path.join(self.work_dir, name)
        marker = self._marker(name)
        if os.path.exists(marker):
            with open(marker) as f:
                meta = json.load(f)
            reader = self.spark.read
            if meta.get("schema"):
                from pyspark.sql.types import StructType

                reader = reader.schema(StructType.fromJson(json.loads(meta["schema"])))
            df = reader.parquet(out_dir)
            run.stages.append(StageResult(name, meta["rows"], 0.0, resumed=True))
            run.outputs[name] = df
            return df

        t0 = time.monotonic()
        df = compute()
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(out_dir)

        # per-partition lineage: one row per output file, from a read-back
        # (survives as an audit trail next to the data). The explicit
        # schema keeps the read-back valid when a stage legitimately
        # produced zero rows (an empty partitioned write has no files).
        back = self.spark.read.schema(df.schema).parquet(out_dir)
        lineage = (
            back.groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("rows_out"))
            .withColumn("stage", F.lit(name))
        )
        lineage.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.work_dir, "_lineage", name)
        )
        rows = back.count()
        wall = time.monotonic() - t0
        with open(marker, "w") as f:
            json.dump(
                {"stage": name, "rows": rows, "wall_s": wall, "schema": df.schema.json()},
                f,
            )
        run.stages.append(StageResult(name, rows, wall, resumed=False))
        run.outputs[name] = back
        return back

    # -- the pipeline ---------------------------------------------------------
    def run(
        self,
        transcripts: DataFrame,
        raw_tables: dict[str, DataFrame],
        repartition: int | None = None,
    ) -> PipelineRun:
        run = PipelineRun()
        st = lambda *a, **k: self.stage(run, *a, **k)  # noqa: E731

        if repartition:
            transcripts = transcripts.repartition(repartition, "conv_id")
        transcripts = st(
            "transcripts",
            lambda: transcripts.sortWithinPartitions("conv_id", "turn_idx"),
        )

        redirects = st(
            "dict_redirects", lambda: D.resolve_redirects(raw_tables["redirects"])
        )
        surface_forms = st(
            "dict_surface_forms",
            lambda: D.surface_priors(
                D.build_surface_forms(raw_tables["surface_forms_raw"], redirects)
            ),
        )
        link_w = st(
            "dict_link_weights", lambda: D.link_weights(raw_tables["topic_contexts"])
        )
        ctx_vecs = st(
            "dict_context_vectors",
            lambda: D.topic_context_vectors(D.top_contexts(link_w)),
        )

        automaton = M.build_automaton(surface_forms)
        mentions = st(
            "mentions", lambda: M.detect_mentions(self.spark, transcripts, automaton)
        )
        candidates = st(
            "candidates",
            lambda: L.attach_context_vectors(
                L.attach_candidates(mentions, surface_forms), ctx_vecs
            ),
        )
        resolved = st("resolved", lambda: CO.resolve(candidates, transcripts))

        canon = st(
            "canonical_map",
            lambda: CZ.canonical_mapping(redirects, raw_tables["same_as"]),
        )
        triples = st(
            "triples",
            lambda: CZ.apply_canonical(
                CZ.apply_canonical(CO.triples_of(resolved), canon, "subj"),
                canon,
                "obj",
            ),
            partition_by=["pred"],
        )
        st(
            "nodes",
            lambda: G.build_nodes(CO.links_of(resolved), canon),
        )
        st("edges", lambda: G.build_edges(triples), partition_by=["pred"])
        return run
