"""PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities evidenced by the reference repo
``bharathsurampudi/End-to-End-MLOps-Airflow-CloudFormation-Great-Expectations``
(infra + pandas feature pipeline; see SURVEY.md), extended with the
relational / streaming / LLM-data-pipeline operator surface mandated by
the driver contract (SURVEY.md §2).

Everything is DataFrame/SQL so Catalyst + AQE optimize the plans; Python
enters only at Arrow-vectorized ``pandas_udf`` / ``applyInPandas`` seams.
"""

__version__ = "0.1.0"
