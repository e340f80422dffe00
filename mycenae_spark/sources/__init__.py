"""Sources & sinks: parquet lake readers, line-protocol decoders, writers.

Mycenae's ingest surface (SURVEY.md §2.1) is HTTP/UDP/telnet JSON or
OpenTSDB line protocol into Cassandra + Solr; here the lake is Parquet and
the decoders are pure DataFrame expressions usable in batch or streaming.
"""
