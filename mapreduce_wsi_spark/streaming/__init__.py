"""Structured Streaming surface.

Not present in the reference at all — its "Streaming Mode" is Hadoop
Streaming (stdin/stdout scripts, MapReduceWSI.java:81-105), not stream
processing. This package is the north-star extension: watermarked windowed
aggregation, session windows, and dedup-within-watermark over the `events`
fixture, built on readStream/writeStream.
"""
