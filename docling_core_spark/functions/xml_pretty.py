"""Fast ``toprettyxml``-equivalent for the DocLang emitter.

The DocLang serializer assembles compact well-formed XML and then needs the
exact pretty form minidom's ``parseString(x).documentElement.toprettyxml()``
produces (the reference's byte contract).  Routing every document through
expat + a full DOM + ``writexml`` was the single hottest step of the doclang
output path (~55% of its profile), so this module re-implements the
parse->pretty round trip directly over the compact string:

- tokenizer for the constrained XML the emitters generate (elements, text,
  CDATA; no comments/PIs/doctype),
- expat-compatible input normalization (line-end folding, attribute
  whitespace normalization, entity expansion),
- a writer that clones CPython 3.11 minidom semantics byte-for-byte:
  Element.writexml's single-Text/CDATA-child inlining, Text.writexml's
  indent+data+newl escaping, CDATASection verbatim output, and
  ``_write_data``'s ``& < " >`` escape order.

``pretty_xml`` raises on anything outside that subset; callers fall back to
minidom, so the fast path can never change output — equality with minidom is
pinned by tests/test_xml_pretty.py over the GT corpus and edge cases.
"""

from __future__ import annotations

import re

_TAG_OPEN_RE = re.compile(
    r"<([A-Za-z_][\w.:-]*)((?:\s+[\w.:-]+=\"[^\"]*\")*)\s*(/?)>"
)
_ATTR_RE = re.compile(r"([\w.:-]+)=\"([^\"]*)\"")
_ENTITY_RE = re.compile(r"&(amp|lt|gt|quot|apos|#x[0-9A-Fa-f]+|#[0-9]+);")

_ENTITIES = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _unescape(value: str) -> str:
    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name in _ENTITIES:
            return _ENTITIES[name]
        if name.startswith("#x"):
            return chr(int(name[2:], 16))
        return chr(int(name[1:]))

    return _ENTITY_RE.sub(sub, value) if "&" in value else value


_NEEDS_ESC = re.compile(r'[&<">]')


def _esc(data: str) -> str:
    """minidom._write_data's escape, in its exact replace order."""
    if _NEEDS_ESC.search(data) is None:
        return data
    return (
        data.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace('"', "&quot;")
        .replace(">", "&gt;")
    )


def _parse(compact: str):
    """Parse the constrained compact XML into ("e", tag, attrs, children) /
    ("t", text) / ("c", cdata) nodes; returns the root element node."""
    # XML line-end normalization happens at the input stream (incl. CDATA)
    if "\r" in compact:
        compact = compact.replace("\r\n", "\n").replace("\r", "\n")
    s = compact
    if s.startswith("<?xml"):
        end = s.index("?>")
        s = s[end + 2 :]
    i, n = 0, len(s)
    root = None
    stack: list[list] = []  # each: [tag, attrs, children]
    find = s.find
    tag_match = _TAG_OPEN_RE.match
    no_attrs: list = []
    while i < n:
        lt = find("<", i)
        if lt != i:
            text = s[i:lt] if lt != -1 else s[i:]
            if stack:
                if "&" in text:
                    text = _unescape(text)
                children = stack[-1][2]
                # expat buffers contiguous character data into one Text node
                if children and children[-1][0] == "t":
                    children[-1][1] += text
                else:
                    children.append(["t", text])
            elif text.strip():
                raise ValueError("text outside root")
            if lt == -1:
                break
            i = lt
        if i + 1 >= n:
            # input ends in a bare '<' — honor the documented ValueError
            # contract instead of leaking an IndexError to direct callers
            raise ValueError("truncated markup")
        nxt = s[i + 1]
        if nxt == "/":
            end = find(">", i)
            tag = s[i + 2 : end]
            if not stack or stack[-1][0] != tag:
                raise ValueError(f"mismatched close tag {tag!r}")
            node = stack.pop()
            closed = ("e", node[0], node[1], node[2])
            if stack:
                stack[-1][2].append(closed)
            else:
                root = closed
            i = end + 1
        elif nxt == "!":
            if s[i : i + 9] != "<![CDATA[":
                raise ValueError("comments/doctype unsupported")
            end = s.index("]]>", i)
            if not stack:
                raise ValueError("cdata outside root")
            data = s[i + 9 : end]
            # expat emits no node for an empty CDATA section, and the text
            # buffer merges straight across it (adjacent "t" nodes coalesce)
            if data:
                stack[-1][2].append(["c", data])
            i = end + 3
        elif nxt == "?":
            raise ValueError("PIs unsupported")
        else:
            m = tag_match(s, i)
            if m is None:
                raise ValueError(f"unparseable tag at {i}")
            tag, rawattrs, selfclose = m.groups()
            if rawattrs:
                attrs = [
                    # attribute-value normalization: literal tab/newline ->
                    # space, then entity expansion (expat order)
                    (
                        a,
                        _unescape(
                            v.replace("\t", " ").replace("\n", " ")
                            if "\t" in v or "\n" in v
                            else v
                        ),
                    )
                    for a, v in _ATTR_RE.findall(rawattrs)
                ]
            else:
                attrs = no_attrs
            if selfclose:
                node = ("e", tag, attrs, [])
                if stack:
                    stack[-1][2].append(node)
                elif root is None:
                    root = node
                else:
                    raise ValueError("multiple roots")
            else:
                stack.append([tag, attrs, []])
            i = m.end()
    if stack or root is None:
        raise ValueError("unclosed element(s)")
    return root


def _write(node, out: list, indent: str, addindent: str, newl: str) -> None:
    _kind, tag, attrs, children = node
    if attrs:
        head = "".join(f' {name}="{_esc(val)}"' for name, val in attrs)
        out.append(f"{indent}<{tag}{head}")
    else:
        out.append(f"{indent}<{tag}")
    if children:
        out.append(">")
        first = children[0]
        if len(children) == 1 and first[0] in ("t", "c"):
            if first[0] == "t":
                out.append(_esc(first[1]))
            else:
                out.append(f"<![CDATA[{first[1]}]]>")
            out.append(f"</{tag}>{newl}")
        else:
            out.append(newl)
            inner = indent + addindent
            for child in children:
                if child[0] == "e":
                    _write(child, out, inner, addindent, newl)
                elif child[0] == "t":
                    out.append(f"{inner}{_esc(child[1])}{newl}")
                else:
                    out.append(f"<![CDATA[{child[1]}]]>")
            out.append(f"{indent}</{tag}>{newl}")
    else:
        out.append(f"/>{newl}")


def pretty_xml(compact: str, indent: str) -> str:
    """``parseString(compact).documentElement.toprettyxml(indent=indent)``,
    byte-for-byte, without building a DOM.  Raises ValueError outside the
    emitters' XML subset — callers fall back to minidom."""
    out: list[str] = []
    _write(_parse(compact), out, "", indent, "\n")
    return "".join(out)
