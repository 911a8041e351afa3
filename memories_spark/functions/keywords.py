"""Keyword-bag query enrichment (reference 5.3.0 'Enriched
keyword-bag queries', CHANGELOG.md:49; extraction rules from the
UserPromptSubmit hook's ``build_keyword_bag``,
plugin/hooks/memory-query.sh:64-82): conversational prompts dilute
semantic similarity with filler, so the hook extracts a compact bag —
project name, code identifiers, version references, domain nouns —
and searches with THAT (the reference measured 6/10 → 9/10 relevance
on real missed-recall prompts).

The extraction grammar (regexes, stopword list, per-group caps) IS
the specified semantics, reproduced from the reference hook; the
implementation is plain Python over it.
"""

from __future__ import annotations

import re

#: CamelCase / snake_case / SCREAMING_SNAKE identifiers
#: (memory-query.sh:70: grep -oE '[A-Z][a-z]+([A-Z][a-z]+)+|
#: [a-z]+_[a-z_]+|[A-Z_]{3,}')
IDENTIFIER_RE = re.compile(
    r"[A-Z][a-z]+(?:[A-Z][a-z]+)+|[a-z]+_[a-z_]+|[A-Z_]{3,}"
)

#: version / issue / PR references (memory-query.sh:72:
#: 'v[0-9]+\.[0-9]+[0-9.]*|#[0-9]+|PR[- ]?[0-9]+')
VERSION_RE = re.compile(r"v[0-9]+\.[0-9]+[0-9.]*|#[0-9]+|PR[- ]?[0-9]+")

#: filler stripped from the domain-noun pass (memory-query.sh:75 —
#: verbatim; the list is the semantics)
STOPWORDS = frozenset(
    "ok okay wait wtf dammit hmm yes no sure right well so but and the "
    "this that is are was were we you i it a an of to in for on with "
    "from by at or not do does did dont doesnt didnt can cant could "
    "would should have has had been be will just also like think feel "
    "want need know see get got let lets go make made way thing stuff "
    "something there then than what when where which who how why about "
    "into more some only other its here very after before because "
    "being our them they these those out uses use used using".split()
)

#: per-group caps (memory-query.sh: head -10 / head -5 / head -15)
MAX_IDENTIFIERS = 10
MAX_VERSIONS = 5
MAX_NOUNS = 15

#: below this enriched length the original prompt serves as the query
#: (memory-query.sh:160-162)
MIN_ENRICHED_LEN = 5


def extract_identifiers(prompt: str) -> list[str]:
    """Sorted-unique code identifiers, capped at 10."""
    return sorted(set(IDENTIFIER_RE.findall(prompt or "")))[:MAX_IDENTIFIERS]


def extract_versions(prompt: str) -> list[str]:
    """Sorted-unique version/issue/PR refs, capped at 5."""
    return sorted(set(VERSION_RE.findall(prompt or "")))[:MAX_VERSIONS]


def extract_domain_nouns(prompt: str) -> list[str]:
    """Lowercased alpha-only words >=3 chars minus stopwords,
    sorted-unique, capped at 15 (the hook's tr/awk pipeline:
    lowercase, squash non-alpha to spaces, filter, sort -u)."""
    words = re.sub(r"[^a-z]+", " ", (prompt or "").lower()).split()
    kept = {w for w in words if len(w) >= 3 and w not in STOPWORDS}
    return sorted(kept)[:MAX_NOUNS]


def build_keyword_bag(prompt: str, project: str = "") -> str:
    """The enriched query: project name + identifiers + versions +
    domain nouns, single-space joined (memory-query.sh:64-82)."""
    parts = [project] if project else []
    parts += extract_identifiers(prompt)
    parts += extract_versions(prompt)
    parts += extract_domain_nouns(prompt)
    return " ".join(p for p in parts if p).strip()


def enrich_query(prompt: str, project: str = "") -> str:
    """Keyword-bag enrichment with the hook's short-prompt fallback:
    an enrichment under :data:`MIN_ENRICHED_LEN` chars serves the
    ORIGINAL prompt instead (memory-query.sh:160-162)."""
    bag = build_keyword_bag(prompt, project)
    return bag if len(bag) >= MIN_ENRICHED_LEN else (prompt or "")


# ---------------------------------------------------------------------
# Intent-based prefix biasing + context enrichment
# (memory-query.sh:142-149, :157-160, :211-227)
# ---------------------------------------------------------------------

#: Strategy-B scoped-prefix templates — the hook's
#: ``MEMORIES_SOURCE_PREFIXES`` default (``_default_source_prefixes``,
#: memory-query.sh:20,27-30): per-client-family project scopes.
DEFAULT_SOURCE_PREFIX_TEMPLATES = (
    "claude-code/{project}",
    "codex/{project}",
    "learning/{project}",
    "wip/{project}",
)

#: The intent case table (memory-query.sh:142-149) — a shell ``case``
#: over the LOWERCASED prompt, ``pattern*`` = starts-with, first
#: match wins in written order. "fixture" matches ``fix*`` and
#: "however" matches ``how*`` exactly as in the hook — the prefix
#: match, not a word match, IS the grammar.
INTENT_PREFIX_RULES: tuple[tuple[tuple[str, ...], tuple[str, ...]], ...] = (
    (
        ("fix", "debug", "error", "bug", "broken", "crash"),
        ("learning/{project}", "bug-fix/{project}"),
    ),
    (
        ("how", "setup", "configure", "install"),
        ("decision/{project}", "learning/{project}"),
    ),
)

#: conversation-context identifiers: CamelCase / snake_case ONLY —
#: unlike the prompt pass, NO SCREAMING_SNAKE alternative
#: (memory-query.sh:157: grep -oE '[A-Z][a-z]+([A-Z][a-z]+)+|
#: [a-z]+_[a-z_]+'), sort -u, head -5
CONTEXT_IDENTIFIER_RE = re.compile(r"[A-Z][a-z]+(?:[A-Z][a-z]+)+|[a-z]+_[a-z_]+")
MAX_CONTEXT_TERMS = 5


def intent_prefixes(prompt: str, project: str) -> tuple[str, ...]:
    """Extra prefix-scoped searches derived from prompt intent
    (memory-query.sh:142-149, queued :221-226): debugging prompts
    bias toward ``learning/`` and ``bug-fix/`` scopes, procedural
    prompts toward ``decision/`` and ``learning/``. Empty without a
    project — the hook guards the queue loop on ``-n "$PROJECT"``."""
    if not project:
        return ()
    low = (prompt or "").lower()
    for starts, templates in INTENT_PREFIX_RULES:
        if any(low.startswith(s) for s in starts):
            return tuple(t.replace("{project}", project) for t in templates)
    return ()


def scoped_search_prefixes(
    project: str,
    prompt: str = "",
    templates: tuple[str, ...] = DEFAULT_SOURCE_PREFIX_TEMPLATES,
) -> tuple[str, ...]:
    """The hook's full Strategy-B queue order (memory-query.sh:
    211-227): the per-client-family ``{project}``-substituted scopes,
    then the intent-biased extras. Empty without a project."""
    if not project:
        return ()
    base = tuple(
        t.replace("{project}", project).strip() for t in templates if t.strip()
    )
    return base + intent_prefixes(prompt, project)


def extract_context_identifiers(context: str) -> list[str]:
    """Sorted-unique CamelCase/snake_case identifiers from recent
    conversation context, capped at 5 (memory-query.sh:157-158)."""
    return sorted(set(CONTEXT_IDENTIFIER_RE.findall(context or "")))[
        :MAX_CONTEXT_TERMS
    ]


def enrich_query_with_context(
    prompt: str, project: str = "", context: str = ""
) -> str:
    """:func:`enrich_query` plus conversation-context identifier
    enrichment (memory-query.sh:153-167): with context present, up to
    5 CamelCase/snake_case identifiers from it are appended to the
    keyword bag. The short-enrichment fallback then serves the
    original prompt — or, when context exists, the hook's verbose
    'Project/Recent conversation/Current prompt' composition
    (:161-166)."""
    bag = build_keyword_bag(prompt, project)
    parts = [bag] if bag else []
    if context:
        parts += extract_context_identifiers(context)
    enriched = " ".join(parts).strip()
    if len(enriched) >= MIN_ENRICHED_LEN:
        return enriched
    if context:
        return (
            f"Project: {project or 'unknown'}\n"
            f"Recent conversation:\n{context}\n"
            f"Current prompt: {prompt or ''}"
        )
    return prompt or ""


# ---------------------------------------------------------------------
# SessionStart / subagent recall fan-out grammars
# (memory-recall.sh:85-120, memory-subagent-recall.sh:59-95)
# ---------------------------------------------------------------------


def recall_query_for_prefix(prefix: str, project: str) -> str:
    """The SessionStart hook's per-prefix canned query
    (memory-recall.sh ``query_for_prefix``, :85-101): client-family
    scopes ask for architecture/conventions, learning scopes for
    fixes/gotchas, wip scopes for deferred work. Shell
    ``pattern/*`` = starts-with on the substituted prefix."""
    if prefix.startswith(("claude-code/", "codex/")):
        return f"project {project} architecture decisions conventions patterns"
    if prefix.startswith("learning/"):
        return f"project {project} fixes gotchas learnings workarounds"
    if prefix.startswith("wip/"):
        return f"project {project} deferred work blockers open threads revisit later"
    return f"project {project} conventions decisions patterns"


def recall_limit_for_prefix(prefix: str) -> int:
    """Per-prefix result budget (memory-recall.sh:110-114):
    client-family scopes get 4, learning/wip get 2, anything else
    the default 3."""
    if prefix.startswith(("claude-code/", "codex/")):
        return 4
    if prefix.startswith(("learning/", "wip/")):
        return 2
    return 3


def query_for_agent_type(agent_type: str, project: str) -> str:
    """The SubagentStart hook's agent-type-tailored query
    (memory-subagent-recall.sh ``query_for_agent_type``, :59-75):
    ``Plan`` and ``Explore`` match exactly, reviewer agents by
    substring (the shell ``*code-reviewer*|*review*`` glob), all
    else falls to the generic architecture query."""
    at = agent_type or ""
    if at == "Plan":
        return (
            f"project {project} architecture decisions design constraints "
            "deferred work"
        )
    if at == "Explore":
        return f"project {project} structure conventions patterns file organization"
    if "code-reviewer" in at or "review" in at:
        return f"project {project} conventions code style patterns known issues"
    return f"project {project} architecture decisions conventions patterns"


def subagent_limit_for_prefix(prefix: str) -> int:
    """Per-prefix budget for subagent recall
    (memory-subagent-recall.sh:86-90): learning/wip get 2,
    everything else (including client-family scopes) 3."""
    if prefix.startswith(("learning/", "wip/")):
        return 2
    return 3


def fallback_query(
    prompt: str,
    project: str = "",
    context: str = "",
    active_files: tuple[str, ...] = (),
) -> str:
    """The hook's verbose fallback ``QUERY_TEXT`` (memory-query.sh:
    170-182): file context ('Files: ' + comma-joined basenames of
    recently touched files, :133-136) and key terms ('Terms: ' +
    comma-joined prompt identifiers, :139-140) prefix a
    Project/Recent-conversation/Current-prompt composition when
    context exists, or stack above the bare prompt otherwise.

    REFERENCE QUIRK, reproduced: the hook assembles
    ``FALLBACK_PREFIX="$FILE_CONTEXT\\n"`` inside double quotes, so
    the separator is a LITERAL backslash-n, not a newline — bash
    ``printf '%s'`` does not expand escapes in arguments."""
    file_ctx = "Files: " + ",".join(active_files) if active_files else ""
    terms = extract_identifiers(prompt)
    key_terms = "Terms: " + ",".join(terms) if terms else ""
    if context:
        pre = ""
        if file_ctx:
            pre += file_ctx + "\\n"
        if key_terms:
            pre += key_terms + "\\n"
        return (
            f"{pre}\nProject: {project or 'unknown'}\n"
            f"Recent conversation:\n{context}\nCurrent prompt: {prompt or ''}"
        )
    if file_ctx or key_terms:
        return f"{file_ctx}\n{key_terms}\n{prompt or ''}"
    return prompt or ""
