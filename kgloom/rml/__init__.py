"""RML frontend: Turtle parsing, document model extraction, and
translation of RML documents into kgloom operator plans.

Parity target: the reference's ``rml-interpreter`` crate (document model +
extractors) and ``translator/src/rmlalgebra`` (plan compiler).
"""

from .turtle import parse_turtle  # noqa: F401
from .model import Document  # noqa: F401
from .extract import extract_document, RmlValidationError  # noqa: F401
from .translate import translate_to_plan  # noqa: F401
