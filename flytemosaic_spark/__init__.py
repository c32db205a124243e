"""flytemosaic_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference engine
(`ljstrnadiii/flytemosaic`, see /root/repo/SURVEY.md): a relational
*catalog* layer (scene planning, incremental anti-join skipping,
url/period math) plus a dense chunked *array* layer (QA-masked
temporal composites, chunk-partition planning, region-parallel
sinks), extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Everything is declared with the DataFrame/SQL API so Catalyst +
Tungsten pick physical strategies; Python appears only inside
Arrow-vectorized pandas UDFs for array kernels.
"""

__version__ = "0.1.0"
