"""Dataflow operators (SURVEY.md §2): stateless transforms, joins,
aggregations, table (KTable) semantics. All thin, declarative wrappers over
DataFrame ops — the point is documented semantics parity with the reference,
while Catalyst keeps full freedom to optimize."""
