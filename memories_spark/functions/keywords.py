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
