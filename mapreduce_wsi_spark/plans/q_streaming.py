"""Streaming-surface queries in their batch-testable form (SURVEY.md §2C).

Filled in with tumbling/sliding/session windows over `events`; the true
readStream/writeStream paths live in mapreduce_wsi_spark/streaming/ and are
exercised by pytest (non-SQL-expressible -> not in the oracle set).
"""
