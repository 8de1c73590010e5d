"""North-rule workload: KG construction over multi-turn transcript
tables (BASELINE.json `north_rule` / `input_hint`) — triple extraction,
mention detection, entity linking, canonicalization via blocking +
connected components, graph materialization with checkpoint/resume.
"""
