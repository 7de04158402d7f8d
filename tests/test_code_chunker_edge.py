"""Edge-case coverage for the Java/C/JS/TS code chunkers beyond the golden
repos: constructs the goldens don't exercise, plus the forced-splitting
path with the brace-language prefix/suffix."""

from __future__ import annotations

from docling_core_spark.functions.code_chunker_c import chunk_c_code
from docling_core_spark.functions.code_chunker_java import chunk_java_code
from docling_core_spark.functions.code_chunker_jsts import chunk_js_code, chunk_ts_code


def _by_name(chunks):
    return {c["meta"].get("part_name"): c for c in chunks}


def test_java_enum_context_and_constructor():
    java = """package com.x;

import java.util.Map;

public enum Color {
\tRED("r"), GREEN("g");

\tprivate final String code;

\tColor(String code) {
\t\tthis.code = code;
\t}

\tpublic String getCode() {
\t\treturn code + Map.of().size();
\t}
}
"""
    chunks = list(chunk_java_code(java))
    names = [c["meta"].get("part_name") for c in chunks]
    # the enum constructor is collectable (name != "<init>") and the method
    assert names[:2] == ["Color", "getCode"]
    get_code = _by_name(chunks)["getCode"]
    # enum context: constants joined with ',' + ';', then body declarations
    assert 'RED("r"),' in get_code["text"] and 'GREEN("g");' in get_code["text"]
    assert "import java.util.Map;" in get_code["text"]
    assert get_code["text"].startswith("package com.x;\n")


def test_java_generic_method_and_interface_context():
    java = """import java.util.List;

interface Ops {
\tint LIMIT = 3;

\t<T> T pick(List<T> xs);

\tdefault int cap() {
\t\treturn LIMIT;
\t}
}
"""
    chunks = list(chunk_java_code(java))
    cap = _by_name(chunks)["cap"]
    # interface context includes constants and member signatures
    assert "int LIMIT = 3;" in cap["text"]
    assert "<T> T pick(List<T> xs);" in cap["text"]
    assert "import java.util.List;" in cap["text"]


def test_java_nested_class_member_ranges():
    java = """public class Outer {
\tprivate int shared = 1;

\tstatic class Inner {
\t\tpublic int get() {
\t\t\treturn 2;
\t\t}
\t}
}
"""
    chunks = list(chunk_java_code(java))
    get = _by_name(chunks)["get"]
    # both class contexts stack, outer first
    assert get["text"].index("class Outer") < get["text"].index("class Inner")
    # Outer itself is also a method-less class per the reference's one-level
    # grandchild check (Inner's method is two levels down), so it chunks too
    types = {c["meta"]["chunk_type"] for c in chunks}
    assert types == {"function", "class"}
    assert _by_name(chunks)["Outer"]["meta"]["chunk_type"] == "class"


def test_c_function_pointer_and_conditional_macros():
    c_src = """#include <stdio.h>

typedef int (compare_fn)(const void *a, const void *b);

int (*handler)(int) = 0;

#if defined(FAST)
#define MODE 1
#elif defined(SLOW)
#define MODE 2
#else
#define MODE 0
#endif

/* main compare */
static int cmp_int(const void *a, const void *b)
{
\treturn MODE + (*(const int *)a - *(const int *)b);
}
"""
    chunks = list(chunk_c_code(c_src))
    cmp_chunk = _by_name(chunks)["cmp_int"]
    # MODE resolves to the LAST #define in document order (dict overwrite)
    assert "#define MODE 0" in cmp_chunk["text"]
    assert "#define MODE 1" not in cmp_chunk["text"]
    assert cmp_chunk["meta"]["docstring"] == "/* main compare */"
    # the function-pointer global and typedef stay unclaimed
    pre = [c for c in chunks if c["meta"]["chunk_type"] == "preamble"][0]
    assert "int (*handler)(int) = 0;" in pre["text"]
    assert "typedef int (compare_fn)" in pre["text"]


def test_c_multiline_macro_and_struct_param():
    c_src = """#define SWAP(a, b) \\
\tdo { int t = (a); (a) = (b); (b) = t; } while (0)

struct pair { int x; int y; };

void flip(struct pair *p)
{
\tSWAP(p->x, p->y);
}
"""
    chunks = list(chunk_c_code(c_src))
    flip = _by_name(chunks)["flip"]
    # the multi-line function-like macro is a used import
    assert "#define SWAP(a, b) \\" in flip["text"]
    # struct tag in the parameter is a type_identifier -> struct not pulled
    assert "struct pair { int x; int y; };" not in flip["text"]


def test_ts_template_literals_getters_and_decorators():
    ts = """import Model from "./Model";

class Store extends Model {
  items: string[] = [];

  /**
   * Adds an item.
   */
  add(name: string): void {
    this.items.push(`item ${name} of ${this.items.length}`);
  }

  @observer
  get count(): number {
    return this.items.length;
  }
}

function top(n: number): number {
  return n * 2;
}
"""
    chunks = list(chunk_ts_code(ts))
    by = _by_name(chunks)
    assert set(by) >= {"add", "count", "top"}
    # doc comment attaches; decorator blocks the docstring (reference quirk)
    assert by["add"]["meta"]["docstring"].startswith("/**")
    assert by["count"]["meta"]["docstring"] == ""
    # base class-context header carries no brace (matches the TS golden's
    # "class Comment extends Model" form)
    assert "class Store extends Model\n" in by["add"]["text"]


def test_js_require_import_and_regex_literal():
    js = """const fs = require("fs");
var re = /[a-z]+\\/?/g;

function read(p) {
  return fs.readFileSync(p) + re.source;
}
"""
    chunks = list(chunk_js_code(js))
    read = _by_name(chunks)["read"]
    # const-require registers as an import; var never does
    assert 'const fs = require("fs");' in read["text"]
    assert "var re" not in read["text"]
    pre = [c for c in chunks if c["meta"]["chunk_type"] == "preamble"][0]
    assert "var re = /[a-z]+\\/?/g;" in pre["text"]


def test_js_exported_functions_never_collect():
    js = """export function pub() {
  return 1;
}

function priv() {
  return 2;
}
"""
    chunks = list(chunk_js_code(js))
    names = [c["meta"].get("part_name") for c in chunks]
    assert "priv" in names and "pub" not in names
    pre = [c for c in chunks if c["meta"]["chunk_type"] == "preamble"][0]
    assert "export function pub()" in pre["text"]


def test_forced_split_uses_brace_prefix_suffix():
    java = "public class A {\n\tpublic int f() {\n" + "".join(
        f"\t\tint v{i} = {i};\n" for i in range(40)
    ) + "\t\treturn v0;\n\t}\n}\n"
    chunks = list(chunk_java_code(java, max_tokens=60, min_chunk_size=5))
    parts = [c for c in chunks if "_part_" in str(c["meta"].get("part_name"))]
    assert len(parts) >= 2
    # every split re-opens with the signature + ' {' prefix and closes with
    # '\n}' (body lines join without newlines — reference _split_function_chunk
    # joins with "", a quirk kept for parity)
    sig = parts[0]["text"].split(" {", 1)[0]
    for p in parts:
        assert p["text"].startswith(sig + " {")
        assert p["text"].endswith("\n}")
