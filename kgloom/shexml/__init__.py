"""ShExML frontend (frontend IR #2).

Parity target: the reference's ``shexml-interpreter`` crate (chumsky
lexer+parser → ShExMLDocument, `/root/reference/shexml-interpreter/src/
parser/type.rs:14-23`) and ``translator/src/shexml`` (document → plan).
Feature scope exceeds the reference's own partial support (its README
"Test cases" skips autoincrement, query statements, cross-source joins,
external functions and conditionals): cross-source JOINs and
AUTOINCREMENT execute here; query statements, external functions and
conditionals remain best-effort skipped.
"""

from .parser import parse_shexml, ShExMLParseError  # noqa: F401
from .translate import shexml_to_plan  # noqa: F401
