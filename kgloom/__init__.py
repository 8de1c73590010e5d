"""kgloom — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the *capabilities* of
s-minoo/algemaploom-rs (an RML/ShExML mapping-plan compiler written in
Rust): the same 8-operator mapping algebra (see ``kgloom.algebra``), the
same plan-construction discipline (``kgloom.plan``), an RML frontend
(``kgloom.rml``) and — unlike the reference, which only *emits* plans —
an actual executor that binds plans to lazy Spark DataFrame DAGs
(``kgloom.exec``) so the official RML test-case golden outputs can be
reproduced.

Reference parity notes cite `/root/reference` files as ``file:line`` in
docstrings throughout; no code is copied from the reference (it is Rust;
this engine is idiomatic PySpark).
"""

__version__ = "0.1.0"
