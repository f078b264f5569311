"""careers_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression (NOT a port) of the capabilities of the
d40cht/Careers reference (Wikipedia-statistics NER + disambiguation):

- dictionary-building aggregations  -> ``operators.dictionary``
- Aho-Corasick mention detection    -> ``operators.mentions``
- anchor-prior x context linking    -> ``operators.linking``
- per-conversation coherence        -> ``operators.coherence``
- triple extraction                 -> ``operators.triples``
- canonicalization (salted CC)      -> ``operators.canonicalize``
- graph materialize + lineage       -> ``operators.graph``, ``plans.pipeline``
- training-data ops (dedup / ANN /
  text-quality / multimodal)        -> ``operators.dedup`` etc.

Everything is declarative DataFrame/SQL; Python appears only inside
Arrow-batched pandas UDFs (mention scan, coherence resolver).
"""

__version__ = "0.1.0"
