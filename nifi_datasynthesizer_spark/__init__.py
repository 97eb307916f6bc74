"""PySpark-native re-implementation of phrocker/nifi-datasynthesizer.

Schema-driven synthetic data generation (log-synth semantics) as pure
Spark column algebra, plus the large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) the
reference's users need at 100 TB.
"""

from .schema import CompiledSchema, SchemaRegistry, compile_schema, synthesize
from .session import get_spark

__all__ = [
    "CompiledSchema",
    "SchemaRegistry",
    "compile_schema",
    "synthesize",
    "get_spark",
]
