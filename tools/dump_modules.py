"""Generate MODULES.md — the public-API reference: every public
operator/function/class the engine exports, its signature, a one-line
contract, and the declared queries that attest it (so a new user can
find `near_dup_pairs` / `decontaminate` / `dedup_corpus` without
reading QUERIES.md's 173 rows).

    python tools/dump_modules.py
"""

from __future__ import annotations

import importlib
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (module, section header) in presentation order
MODULES: tuple[tuple[str, str], ...] = (
    ("kaflow_spark.app", "App surface (kaflow parity)"),
    ("kaflow_spark.message", "App surface (kaflow parity)"),
    ("kaflow_spark.params", "App surface (kaflow parity)"),
    ("kaflow_spark.testclient", "App surface (kaflow parity)"),
    ("kaflow_spark.security", "App surface (kaflow parity)"),
    ("kaflow_spark.asyncapi", "App surface (kaflow parity)"),
    ("kaflow_spark.serde.serializers", "Serde"),
    ("kaflow_spark.serde.pydantic_schema", "Serde"),
    ("kaflow_spark.session", "Session & catalog"),
    ("kaflow_spark.catalog", "Session & catalog"),
    ("kaflow_spark.oracle", "Session & catalog"),
    ("kaflow_spark.operators.asof", "Relational operators"),
    ("kaflow_spark.operators.rangejoin", "Relational operators"),
    ("kaflow_spark.operators.skew", "Relational operators"),
    ("kaflow_spark.operators.events", "Event / warehouse operators"),
    ("kaflow_spark.operators.dedup", "Dedup & near-dup"),
    ("kaflow_spark.operators.graph", "Graph"),
    ("kaflow_spark.operators.similarity", "Similarity search"),
    ("kaflow_spark.operators.embeddings", "Embedding analytics"),
    ("kaflow_spark.operators.resolution", "Entity resolution"),
    ("kaflow_spark.operators.curation", "Corpus curation"),
    ("kaflow_spark.operators.tokenizer", "Tokenization"),
    ("kaflow_spark.operators.multimodal", "Multimodal"),
    ("kaflow_spark.operators.cdc", "Event / warehouse operators"),
    ("kaflow_spark.operators.parallelism", "Session & catalog"),
    ("kaflow_spark.functions.textstats", "Column-level functions"),
    ("kaflow_spark.functions.vectors", "Column-level functions"),
    ("kaflow_spark.functions.sketches", "Column-level functions"),
    ("kaflow_spark.sources", "Sources & sinks"),
    ("kaflow_spark.sources.kafka_segment", "Sources & sinks"),
    ("kaflow_spark.sources.segments", "Sources & sinks"),
    ("kaflow_spark.streaming.windows", "Structured Streaming"),
    ("kaflow_spark.streaming.dedup", "Structured Streaming"),
    ("kaflow_spark.streaming.stateful", "Structured Streaming"),
    ("kaflow_spark.streaming.curation", "Structured Streaming"),
    ("kaflow_spark.streaming.neardup", "Structured Streaming"),
    ("kaflow_spark.streaming.asof", "Structured Streaming"),
    ("kaflow_spark.streaming.tws", "Structured Streaming"),
    ("kaflow_spark.streaming.exactly_once", "Structured Streaming"),
)

_QREF = re.compile(r"\bq\d{2,3}\b")


def _first_line(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.strip().split())
    for stop in (". ", "; "):
        i = text.find(stop)
        if 0 < i < 160:
            return text[: i + 1].rstrip()
    return (text[:157] + "...") if len(text) > 160 else text


def _query_chunks() -> list[tuple[str, str]]:
    """(declared_query_name, source_chunk) pairs from the queries
    package — a chunk is everything between one @declare(...) and the
    next, so a member name appearing in it means that query exercises
    the member."""
    qdir = os.path.join(REPO, "kaflow_spark", "queries")
    decl = re.compile(r"declare\(\s*[\"']([^\"']+)[\"']")
    chunks: list[tuple[str, str]] = []
    for fname in sorted(os.listdir(qdir)):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(qdir, fname)).read()
        starts = [(m.start(), m.group(1)) for m in decl.finditer(src)]
        for i, (pos, qname) in enumerate(starts):
            end = starts[i + 1][0] if i + 1 < len(starts) else len(src)
            chunks.append((qname, src[pos:end]))
    return chunks


def _attestation(name: str, doc: str, chunks: list[tuple[str, str]]) -> str:
    """Sorted q-numbers referencing this member: the member's own
    docstring citations plus every declared-query body that calls it."""
    refs = set(_QREF.findall(doc or ""))
    pat = re.compile(rf"\b{re.escape(name)}\b")
    for qname, chunk in chunks:
        if pat.search(chunk):
            refs.add(qname.split("_")[0])
    ordered = sorted(refs, key=lambda q: int(q[1:]))
    if not ordered:
        return "engine tests"
    shown = ordered[:8]
    tail = f" +{len(ordered) - 8}" if len(ordered) > 8 else ""
    return ", ".join(shown) + tail


def _sig(obj) -> str:
    try:
        s = str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"
    s = re.sub(r"\s+", " ", s)
    return s if len(s) <= 90 else s[:87] + "..."


def main() -> None:
    chunks = _query_chunks()
    sections: dict[str, list[str]] = {}
    seen: set[int] = set()
    for modname, section in MODULES:
        mod = importlib.import_module(modname)
        rows = sections.setdefault(section, [])
        public = getattr(mod, "__all__", None)
        members = []
        for name, obj in vars(mod).items():
            if name.startswith("_"):
                continue
            if public is not None and name not in public:
                continue
            if not (inspect.isfunction(obj) or inspect.isclass(obj)):
                continue
            if getattr(obj, "__module__", None) != modname:
                continue  # re-exports documented at their home module
            if id(obj) in seen:
                continue
            seen.add(id(obj))
            members.append((name, obj))
        if not members:
            continue
        rows.append(f"\n### `{modname}`\n")
        rows.append("| member | signature | contract | attested by |")
        rows.append("|---|---|---|---|")
        for name, obj in sorted(members):
            doc = inspect.getdoc(obj) or ""
            kind = "class " if inspect.isclass(obj) else ""
            summary = _first_line(doc).replace("|", "\\|")
            att = _attestation(name, doc, chunks)
            rows.append(
                f"| {kind}`{name}` | `{_sig(obj)}` | {summary} | {att} |"
            )

    out = [
        "# MODULES — public API reference",
        "",
        "Generated by `python tools/dump_modules.py` from live module",
        "introspection. One row per public function/class defined in the",
        "listed module (re-exports are documented once, at their home",
        "module). \"attested by\" lists the declared queries whose bodies",
        "call the member or whose docstring cites it — each of those is",
        "oracle-checked per QUERIES.md; \"engine tests\" means the member",
        "is exercised by the pytest suite rather than a declared query.",
    ]
    for section in dict.fromkeys(s for _, s in MODULES):
        if section not in sections:
            continue
        out.append(f"\n## {section}")
        out.extend(sections[section])
    with open(os.path.join(REPO, "MODULES.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    n_rows = sum(1 for s in sections.values() for r in s if r.startswith("| "))
    print(f"MODULES.md written ({n_rows} members)")


if __name__ == "__main__":
    main()
