"""ontoea_spark — PySpark-native KG-construction & entity-alignment engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
OntoEA system (/root/reference, ZihengZZH/OntoEA, Findings of ACL-IJCNLP
2021): triple extraction from web pages, deterministic dictionary encoding,
ontology-guided entity alignment with a blocked cosine top-k similarity
join, and partitioned graph materialization — expressed as idiomatic Spark
DataFrame plans so Catalyst/AQE pick the physical strategy.

Layout:
  functions/  scalar expression builders (portable hashing, text, vectors)
  operators/  relational operators (dictionary encoding, filters, dedup,
              similarity join, top-k, evaluation)
  ontology/   class-tree kernel (paths, disjointness, compatibility)
  pipeline/   end-to-end KG construction (pages -> triples -> graph)
  alignment/  embedding trainer + alignment inference
  streaming/  structured-streaming ingest
"""

__version__ = "0.1.0"
