"""Pure-Python query/extraction semantics (no Spark imports here).

These functions define WHAT the engine computes; the Spark layers in
``cianparser_spark.engine`` decide HOW it executes.  Everything in this
package is deterministic, import-safe inside executors, and unit-tested
against golden values derived from the reference's documented behavior.
"""
