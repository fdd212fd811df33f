"""PySpark-native analytics engine with the query surface of
abhivicks22/Real_Time_Data_Pipeline (see SURVEY.md).

Design: every operator is a pure ``DataFrame -> DataFrame`` function that
runs identically in batch (`spark.read`) and streaming (`spark.readStream` +
`foreachBatch`).  Nothing here hand-schedules what Catalyst already
optimizes: plans are declared with the DataFrame/SQL API; shuffles are
minimized by broadcasting bounded dimensions and pre-aggregating before
wide exchanges; Python UDFs appear only where built-in functions genuinely
cannot express the semantics (Arrow-batched, never row-at-a-time).
"""

__version__ = "0.1.0"
