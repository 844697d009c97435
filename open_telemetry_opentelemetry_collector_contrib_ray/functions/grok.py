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
    # --- URI family (standard public grok base set) ---
    "IPORHOST": r"(?:(?:\d{1,3}\.){3}\d{1,3}|\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b)",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+\-.]*",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # --- AWS ELB access-log URI decomposition (elastic go-grok's ECS
    # pattern set; the reference's ExtractGrokPatterns ships these —
    # e2e_test.go ELB_URI case expects the url.* ECS keys) ---
    "ELB_URIHOST": r"%{IPORHOST:[url][domain]}(?::%{POSINT:[url][port]:int})?",
    "ELB_URIPATHQUERY": r"%{URIPATH:[url][path]}(?:\?%{URIQUERY:[url][query]})?",
    "ELB_URIPATHPARAM": r"%{ELB_URIPATHQUERY}",
    "ELB_URI": r"%{URIPROTO:[url][scheme]}://(?:%{USER:[url][username]}(?::[^@]*)?@)?(?:%{ELB_URIHOST})?(?:%{ELB_URIPATHQUERY})?",
}

# %{NAME}, %{NAME:capture}, %{NAME:capture:type} — capture may be a
# dotted ECS name (url.port) or go-grok bracket form ([url][port]);
# type is go-grok's int/long/float/double/bool conversion suffix
_GROK_REF = re.compile(
    r"%\{(\w+)(?::((?:\[\w+\])+|[\w.@\-]+))?(?::(int|long|float|double|bool|boolean|string))?\}")


def compile_grok(pattern: str, definitions: dict[str, str] | None = None,
                 named_captures_only: bool = True,
                 ) -> tuple[str, list[tuple[str, str, str | None]]]:
    """Expand a grok expression into (regex, fields).

    fields is the ordered capture list as (safe_group_name,
    display_name, type) — display names keep ECS dots ("url.port",
    go-grok bracket form [url][port] normalizes to the dotted form),
    safe names are the Python-identifier group names embedded in the
    regex, and type is go-grok's conversion suffix (int/float/bool) or
    None for string.
    """
    lib = dict(BASE_PATTERNS)
    if definitions:
        lib.update(definitions)
    fields: list[tuple[str, str, str | None]] = []
    used: set[str] = set()

    def unique_safe(display: str) -> str:
        base = re.sub(r"[^0-9A-Za-z_]", "_", display).strip("_") or "f"
        if base[0].isdigit():
            base = "f_" + base
        safe, i = base, 1
        while safe in used:
            i += 1
            safe = f"{base}_{i}"
        used.add(safe)
        return safe

    def expand(src: str, depth: int) -> str:
        if depth > 20:
            raise ValueError("grok expansion too deep (cycle?)")

        def sub(m: re.Match) -> str:
            name, capture, typ = m.group(1), m.group(2), m.group(3)
            if name not in lib:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            body = expand(lib[name], depth + 1)
            if capture:
                if capture.startswith("["):
                    display = ".".join(re.findall(r"\[(\w+)\]", capture))
                else:
                    display = capture
                safe = unique_safe(display)
                fields.append((safe, display, typ))
                return f"(?P<{safe}>{body})"
            if named_captures_only:
                return f"(?:{body})"
            safe = unique_safe(name.lower())
            fields.append((safe, name.lower(), typ))
            return f"(?P<{safe}>{body})"

        return _GROK_REF.sub(sub, src)

    return expand(pattern, 0), fields


def expand_grok(pattern: str, definitions: dict[str, str] | None = None,
                named_captures_only: bool = True) -> str:
    """Expand %{NAME[:capture]} references into a plain regex with named
    groups (regex only — compile_grok also returns the field table)."""
    return compile_grok(pattern, definitions, named_captures_only)[0]
