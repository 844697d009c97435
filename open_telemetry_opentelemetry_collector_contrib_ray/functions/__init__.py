from .ast import (  # noqa: F401
    ExprContext,
    Statement,
    parse_condition,
    parse_statement,
)
from .grok import BASE_PATTERNS, expand_grok  # noqa: F401
from .registry import (  # noqa: F401
    get_function,
    parse_duration_us,
    register_converter,
    register_editor,
    register_row_converter,
    registered_functions,
)
