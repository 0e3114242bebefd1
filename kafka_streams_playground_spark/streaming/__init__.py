"""Structured Streaming layer (SURVEY.md §2.9).

Streaming twins of the reference topologies: file-stream replay of the
fixtures stands in for the Kafka topics (no broker in the test env; the
Kafka source builders live in :mod:`..sources.kafka` and produce the same
typed DataFrames, so every transform below is source-agnostic).
"""
