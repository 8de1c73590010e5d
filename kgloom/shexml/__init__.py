"""ShExML frontend (frontend IR #2).

Parity target: the reference's ``shexml-interpreter`` crate (chumsky
lexer+parser → ShExMLDocument, `/root/reference/shexml-interpreter/src/
parser/type.rs:14-23`) and ``translator/src/shexml`` (document → plan).
Feature scope exceeds the reference's own partial support (its README
"Test cases" skips autoincrement, query statements, cross-source joins,
external functions and conditionals): cross-source JOINs,
AUTOINCREMENT, QUERY statements (local bodies), FUNCTIONS calls and
``IF`` conditionals (implementations supplied via
``engine.run_shexml(functions=...)``) all execute here; remote query
files and unregistered helpers remain best-effort skipped.
"""

from .parser import parse_shexml, ShExMLParseError  # noqa: F401
from .translate import shexml_to_plan  # noqa: F401
