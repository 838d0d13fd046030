"""rayld — Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the JSON-LD 1.0 processing capabilities of
linked-data-dotnet/json-ld.net (context resolution, expansion, compaction,
flattening, framing, toRDF, fromRDF, canonical normalization), re-architected
as streaming ``ray.data.Dataset`` pipelines over Parquet transcript shards.

Layout:
    rayld.kernel     pure-Python JSON-LD kernels (no Ray imports)
    rayld.sources    dataset sources (transcripts generator, N-Quads reader)
    rayld.stages     map_batches / actor-pool stage callables
    rayld.pipelines  composed Ray Data pipelines (KG construction, dedup, text, ANN)
    rayld.state      broadcastable state (gazetteer, context registry)
"""

__version__ = "0.1.0"
