"""Go ``net/url`` parsing semantics, ported for parseutils parity.

The reference's URI surfaces — the stanza ``uri_parser``
(pkg/stanza/operator/parser/uri/parser.go:40-47) and the OTTL ``URL``
converter (pkg/ottl/ottlfuncs/func_url.go:31-46) — both call
``parseutils.ParseURI`` (internal/coreinternal/parseutils/uri.go:22-52),
which wraps Go's ``net/url``.  Python's ``urllib.parse`` diverges from
``net/url`` on exactly the cases the reference test tables pin down
(ParseRequestURI's absolute-or-rooted requirement, the semicolon error
in ParseQuery, opaque rootless URIs like ``magnet:?xt=...``, escaped
path preservation via EscapedPath, last-``@`` userinfo splits), so this
module ports the relevant ``net/url`` subset directly:

- :func:`parse_url` — ``url.Parse`` / ``url.ParseRequestURI``
- :func:`parse_query` — ``url.ParseQuery`` (strict; Go >=1.17
  semicolon rejection)
- :func:`parse_uri` — ``parseutils.ParseURI`` (both the plain
  ``urlToMap`` and the semconv-compliant ``urlToSemconvMap`` shapes)

Pure per-string functions; callers batch them inside ``map_batches``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

_HEX = "0123456789ABCDEFabcdef"


def _unescape(s: str, plus_to_space: bool = False) -> str:
    """url.unescape: %XX decode; mode encodeQueryComponent maps '+'."""
    if "%" not in s and (not plus_to_space or "+" not in s):
        return s
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 2 >= n or s[i + 1] not in _HEX or s[i + 2] not in _HEX:
                bad = s[i:i + 3]
                raise ValueError(f"invalid URL escape {bad!r}")
            out.append(int(s[i + 1:i + 3], 16))
            i += 3
            continue
        if c == "+" and plus_to_space:
            out.append(0x20)
        else:
            out += c.encode("utf-8")
        i += 1
    return out.decode("utf-8", errors="surrogateescape")


# shouldEscape(c, encodePath) portion of url.escape, used by
# EscapedPath() when RawPath is absent: alphanumerics and "-_.~" never
# escape; of the reserved set "$&+,/:;=?@" a path escapes only "?".
_PATH_SAFE = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-_.~$&+,/:;=@")


def _escape_path(s: str) -> str:
    if all(c in _PATH_SAFE for c in s):
        return s
    out = []
    for b in s.encode("utf-8"):
        ch = chr(b)
        if ch in _PATH_SAFE:
            out.append(ch)
        else:
            out.append(f"%{b:02X}")
    return "".join(out)


@dataclass
class GoURL:
    """The fields of Go's url.URL this port needs."""

    scheme: str = ""
    opaque: str = ""
    username: str | None = None     # nil User <-> username is None
    password: str | None = None     # set only when ':' present
    host: str = ""                  # host or host:port, unescaped
    path: str = ""                  # decoded
    raw_path: str = ""              # set only when != encoded(path)
    force_query: bool = False
    raw_query: str = ""
    fragment: str = ""
    omit_host: bool = field(default=False, repr=False)

    # url.Hostname() / url.Port()
    def hostname(self) -> str:
        h, _ = _split_host_port(self.host)
        return h

    def port(self) -> str:
        _, p = _split_host_port(self.host)
        return p

    def escaped_path(self) -> str:
        if self.raw_path:
            return self.raw_path
        return _escape_path(self.path)

    def user_string(self) -> str:
        if self.username is None:
            return ""
        if self.password is None:
            return _escape_userinfo(self.username)
        return (_escape_userinfo(self.username) + ":"
                + _escape_userinfo(self.password))

    def query(self) -> dict[str, list[str]]:
        """url.Query(): ParseQuery with errors silently dropped."""
        return parse_query(self.raw_query, ignore_errors=True)

    def string(self) -> str:
        """url.String() — the subset needed for url.original."""
        buf = []
        if self.scheme:
            buf.append(self.scheme + ":")
        if self.opaque:
            buf.append(self.opaque)
        else:
            if self.scheme or self.host or self.username is not None:
                if not (self.omit_host and not self.host
                        and self.username is None):
                    if (self.host or self.path
                            or self.username is not None):
                        buf.append("//")
                    if self.username is not None:
                        buf.append(self.user_string() + "@")
                    buf.append(self.host)
            p = self.escaped_path()
            if p and p[0] != "/" and self.host:
                buf.append("/")
            buf.append(p)
        if self.force_query or self.raw_query:
            buf.append("?" + self.raw_query)
        if self.fragment:
            buf.append("#" + _escape_path(self.fragment))
        return "".join(buf)


_USERINFO_SAFE = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-_.~$&+,;=:!'()*")


def _escape_userinfo(s: str) -> str:
    if all(c in _USERINFO_SAFE for c in s):
        return s
    out = []
    for b in s.encode("utf-8"):
        ch = chr(b)
        out.append(ch if ch in _USERINFO_SAFE else f"%{b:02X}")
    return "".join(out)


def _split_host_port(host_port: str) -> tuple[str, str]:
    host, port = host_port, ""
    colon = host.rfind(":")
    if colon != -1 and _valid_optional_port(host[colon:]):
        host, port = host[:colon], host[colon + 1:]
    if host.startswith("[") and host.endswith("]"):
        host = host[1:-1]
    return host, port


def _valid_optional_port(port: str) -> bool:
    if port == "":
        return True
    if port[0] != ":":
        return False
    return all(c.isdigit() and c.isascii() for c in port[1:])


def _get_scheme(raw: str) -> tuple[str, str]:
    for i, c in enumerate(raw):
        if c.isascii() and c.isalpha():
            continue
        if c.isascii() and (c.isdigit() or c in "+-."):
            if i == 0:
                return "", raw
            continue
        if c == ":":
            if i == 0:
                raise ValueError("missing protocol scheme")
            return raw[:i], raw[i + 1:]
        return "", raw
    return "", raw


def _parse_host(host: str) -> str:
    if host.startswith("["):
        i = host.rfind("]")
        if i < 0:
            raise ValueError("missing ']' in host")
        port = host[i + 1:]
        if not _valid_optional_port(port):
            raise ValueError(f"invalid port {port!r} after host")
    else:
        i = host.rfind(":")
        if i != -1:
            port = host[i:]
            if not _valid_optional_port(port):
                raise ValueError(f"invalid port {port!r} after host")
    return _unescape(host)


def _parse_authority(authority: str) -> tuple[str | None, str | None, str]:
    """-> (username|None, password|None, host)."""
    i = authority.rfind("@")
    if i < 0:
        return None, None, _parse_host(authority)
    userinfo, hostpart = authority[:i], authority[i + 1:]
    host = _parse_host(hostpart)
    if ":" not in userinfo:
        return _unescape(userinfo), None, host
    user, _, pw = userinfo.partition(":")
    return _unescape(user), _unescape(pw), host


def parse_url(raw: str, via_request: bool = False) -> GoURL:
    """url.Parse (via_request=False) / url.ParseRequestURI (=True).

    Faithful to net/url's parse() control flow (url.go:495-553); raises
    ValueError where Go returns an error.
    """
    for c in raw:
        if ord(c) < 0x20 or ord(c) == 0x7F:
            raise ValueError("invalid control character in URL")
    if raw == "" and via_request:
        raise ValueError("empty url")
    u = GoURL()
    frag = ""
    if not via_request:
        raw, _, frag = raw.partition("#")
    if raw == "*":
        u.path = "*"
        return u
    scheme, rest = _get_scheme(raw)
    u.scheme = scheme.lower()
    if rest.endswith("?") and "?" not in rest[:-1]:
        u.force_query = True
        rest = rest[:-1]
    else:
        rest, _, u.raw_query = rest.partition("?")
    if not rest.startswith("/"):
        if u.scheme:
            # rootless path per RFC 3986 -> opaque
            u.opaque = rest
            if frag:
                u.fragment = _unescape(frag)
            return u
        if via_request:
            raise ValueError("invalid URI for request")
        segment = rest.split("/", 1)[0]
        if ":" in segment:
            raise ValueError(
                "first path segment in URL cannot contain colon")
    if ((u.scheme or (not via_request and not rest.startswith("///")))
            and rest.startswith("//")):
        authority, sep, tail = rest[2:].partition("/")
        rest = sep + tail
        u.username, u.password, u.host = _parse_authority(authority)
    elif u.scheme and rest.startswith("/"):
        u.omit_host = True
    u.path = _unescape(rest)
    if rest != _escape_path(u.path):
        u.raw_path = rest
    if frag:
        u.fragment = _unescape(frag)
    return u


def parse_query(qs: str, ignore_errors: bool = False) -> dict[str, list[str]]:
    """url.ParseQuery: '&'-separated, strict %-escapes, ';' rejected
    (Go >=1.17).  With ignore_errors=True behaves like url.Query()."""
    out: dict[str, list[str]] = {}
    err: str | None = None
    while qs:
        key, _, qs = qs.partition("&")
        if ";" in key:
            err = err or "invalid semicolon separator in query"
            continue
        if key == "":
            continue
        key, _, value = key.partition("=")
        try:
            key = _unescape(key, plus_to_space=True)
            value = _unescape(value, plus_to_space=True)
        except ValueError as e:
            err = err or str(e)
            continue
        out.setdefault(key, []).append(value)
    if err and not ignore_errors:
        raise ValueError(err)
    return out


# parseutils.ParseURI (uri.go:22-52) and its two mapping shapes.

URL_USER_INFO = "url.user_info"
URL_USERNAME = "url.username"
URL_PASSWORD = "url.password"


def parse_uri(value: str, semconv: bool = False) -> dict:
    if value.startswith("?"):
        q = parse_query(value[1:])
        return _query_to_map(q, {})
    if semconv:
        u = parse_url(value)
        return _url_to_semconv_map(u)
    u = parse_url(value, via_request=True)
    return _url_to_map(u)


def _url_to_map(u: GoURL) -> dict:
    m: dict = {}
    if u.scheme:
        m["scheme"] = u.scheme
    if u.username:
        m["user"] = u.username
    if u.hostname():
        m["host"] = u.hostname()
    if u.port():
        m["port"] = u.port()
    if u.escaped_path():
        m["path"] = u.escaped_path()
    return _query_to_map(u.query(), m)


def _query_to_map(query: dict[str, list[str]], m: dict) -> dict:
    if not query:
        return m
    m["query"] = {k: list(v) for k, v in query.items()}
    return m


def _url_to_semconv_map(u: GoURL) -> dict:
    m: dict = {
        "url.original": u.string(),
        "url.domain": u.hostname(),
        "url.scheme": u.scheme,
        "url.path": u.path,
    }
    if u.port():
        m["url.port"] = int(u.port())
    if u.fragment:
        m["url.fragment"] = u.fragment
    if u.username is not None:
        m[URL_USER_INFO] = u.user_string()
        if u.username:
            m[URL_USERNAME] = u.username
        if u.password is not None:
            m[URL_PASSWORD] = u.password
    if u.raw_query:
        m["url.query"] = u.raw_query
    period = u.path.rfind(".")
    if period != -1 and period < len(u.path) - 1:
        m["url.extension"] = u.path[period + 1:]
    return m
