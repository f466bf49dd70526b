"""TPU-native Du Guang OCR / Document-AI framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of
AlibabaResearch/AdvancedLiterateMachinery (scene-text recognition, text
spotting, table structure recognition, layout analysis, document parsing
pipelines, and benchmark evaluators), designed TPU-first:

- ``ops``      — kernel layer (Pallas + XLA): image front end, deformable
                 sampling, heatmap decode, NMS, attention aggregation.
- ``models``   — flax model families (MGP-STR, LISTER, LevOCR, LORE-TSR,
                 OmniParser, ...).
- ``codecs``   — unified label-converter / tokenizer registry.
- ``data``     — host-side dataset readers + fixed-shape batching.
- ``engine``   — single pjit train loop + batched inference engine.
- ``parallel`` — mesh construction and sharding rules (dp/fsdp/tp axes).
- ``pipelines``— DocXChain-style composable document pipelines.
- ``eval``     — benchmark harnesses and metrics.
"""

__version__ = "0.1.0"

from advancedliteratemachinery_tpu.core.precision import Policy  # noqa: F401
