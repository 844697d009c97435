"""Grok pattern -> RE2-compatible regex expansion.

Semantics mirror the reference's ExtractGrokPatterns
(/root/reference/pkg/ottl/ottlfuncs/func_extract_grok_patterns.go:17-89):
a grok expression references library patterns as ``%{NAME}`` or
``%{NAME:capture}``; expansion is recursive; with
``named_captures_only`` true only explicitly-named captures are kept.

The pattern library below is the standard public grok base set
(subset), written from the well-known pattern definitions.  Expansion
happens ONCE at compile time (module import / actor __init__); the
resulting plain regex runs vectorized via pyarrow.compute.
"""

from __future__ import annotations

import re

BASE_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "LOGLEVEL": r"(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Nn]otice|NOTICE|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|[Ee]merg(?:ency)?|EMERG(?:ENCY)?)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}(?::\d{2}(?:[.,]\d+)?)?(?:Z|[+-]\d{2}:?\d{2})?",
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"0?[1-9]|1[0-2]",
    "MONTHDAY": r"(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9]",
    "HOUR": r"2[0123]|[01]?[0-9]",
    "MINUTE": r"[0-5][0-9]",
    "SECOND": r"(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?",
    "QUOTEDSTRING": r'"(?:[^"\\]|\\.)*"',
    "PATH": r"(?:/[^\s/]*)+",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]]+))?\}")


def expand_grok(pattern: str, definitions: dict[str, str] | None = None,
                named_captures_only: bool = True, _depth: int = 0) -> str:
    """Expand %{NAME[:capture]} references into a plain regex with named groups."""
    if _depth > 20:
        raise ValueError("grok expansion too deep (cycle?)")
    lib = dict(BASE_PATTERNS)
    if definitions:
        lib.update(definitions)

    def sub(m: re.Match) -> str:
        name, capture = m.group(1), m.group(2)
        if name not in lib:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        body = expand_grok(lib[name], definitions, named_captures_only, _depth + 1)
        if capture:
            safe = capture.replace(".", "_").replace("[", "_").replace("]", "")
            return f"(?P<{safe}>{body})"
        if named_captures_only:
            return f"(?:{body})"
        return f"(?P<{name.lower()}>{body})"

    return _GROK_REF.sub(sub, pattern)
