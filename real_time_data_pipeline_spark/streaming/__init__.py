"""Structured Streaming surface (SURVEY.md §2.1, §2.4, §3 EP1).

The batch operators in ``operators/`` are pure DataFrame→DataFrame
functions; this package wraps them behind ``readStream`` sources and
``writeStream`` sinks, reproducing the reference's streaming DAG
(reference src/spark/transaction_processor.py:146-216) with the declared-
only extensions (dead-letter, alerts, partitioned warehouse sink,
sliding windows) implemented.
"""
