"""TSDB operator layer: PromQL-semantics operators on points DataFrames."""
