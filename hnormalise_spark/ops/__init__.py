"""Large-scale training-data pipeline operators (beyond the reference):
deduplication, similarity search, text analysis, multimodal plumbing.

Design rule shared with the parse layer: JVM expressions first; cross-
engine-checkable determinism (md5-based hashing, never spark hash());
HOF stages isolated so surrounding projects keep whole-stage codegen.
"""
