"""Reference-entity catalog (gazetteer): synthesis, loading, node explosion.

The gazetteer is a *dimension* dataset (tens of thousands of rows at most —
the real Vietnamese catalog is 63+696+10,035 old units and 34+3,321 new units,
≈38.7k exploded match nodes). It is therefore ALWAYS broadcast-sized: the
engine builds it once driver-side, persists it as reference tables, and ships
it to executors via ``F.broadcast`` joins or per-executor singletons inside
iterator pandas UDFs. No shuffle ever touches it.
"""

from address_parser_spark.gazetteer.synth import synth_gazetteer, Gazetteer
from address_parser_spark.gazetteer.nodes import build_nodes, NODE_SCHEMA, nodes_to_spark

__all__ = ["synth_gazetteer", "Gazetteer", "build_nodes", "NODE_SCHEMA", "nodes_to_spark"]
