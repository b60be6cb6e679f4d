"""Public Suffix List engine: eTLD+1 as a pure Catalyst expression.

Implements the full publicsuffix.org rule semantics — exact rules of any
label depth, wildcard ``*.x`` rules, ``!exception`` rules, the implicit
``*`` default, and IDN rules matched in both Unicode and punycode form —
over a vendored rule file in the upstream format
(``data/public_suffix_list.dat``; drop in the complete upstream file to
widen coverage with no code change). Round-6 verdict "Next round" #5:
the previous two-label-only frozenset mis-grouped wildcard-TLD hosts
(``anything.mm``) and deep-rule hosts (``foo.k12.ak.us``).

Scale shape: everything compiles to a map-only expression — the host is
split once, each distinct rule depth contributes ONE constant-folded
``isin`` probe (Catalyst InSet hash lookup, whole-stage codegen), and
the prevailing-rule arithmetic is a ``greatest``/``CASE`` over those
probes. No join, no broadcast, no UDF: the full PSL is a few hash sets
folded into the plan, identical per-row cost at any corpus size.

Algorithm (publicsuffix.org/list/ spec):
1. among all matching rules, the prevailing rule is the longest, except
   that a matching EXCEPTION rule always prevails (its public suffix is
   the rule minus its leftmost label);
2. a wildcard rule ``*.base`` matches any host whose tail is one label
   followed by ``base`` (public-suffix length = len(base)+1);
3. if no rule matches, the default rule ``*`` applies (the TLD itself is
   the public suffix);
4. the registrable domain is the public suffix plus one label; a host
   that IS a public suffix (or shorter) has none.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)


@dataclass(frozen=True)
class PslRules:
    """Rule sets keyed by label depth. ``exact[j]`` holds j-label exact
    rules; ``wildcard[j]`` holds the j-label BASES of ``*.base`` rules
    (matching public suffixes of j+1 labels); ``exception[j]`` holds
    j-label exception rules (public suffix = the rule's last j-1
    labels)."""

    exact: dict[int, frozenset[str]]
    wildcard: dict[int, frozenset[str]]
    exception: dict[int, frozenset[str]]


def _puny(rule: str) -> str | None:
    """Punycode twin of an IDN rule (None when pure ASCII or
    unencodable). Rules are matched textually, so an IDN rule must also
    match hosts already in their DNS (xn--) form."""
    if rule.isascii():
        return None
    try:
        return ".".join(
            lab if lab.isascii() else lab.encode("idna").decode("ascii")
            for lab in rule.split(".")
        )
    except UnicodeError:
        return None


@lru_cache(maxsize=4)
def load_psl_rules(path: str = _DEFAULT_PATH) -> PslRules:
    """Parse an upstream-format rule file. Comment (``//``) and blank
    lines skip; anything after whitespace on a rule line is ignored
    (the upstream file has no such lines, but the spec says to)."""
    exact: dict[int, set[str]] = {}
    wildcard: dict[int, set[str]] = {}
    exception: dict[int, set[str]] = {}
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("//"):
                continue
            rule = line.split()[0].lower()
            # classify BEFORE punycoding: encoding '!x'/'*.x' whole would
            # swallow the marker into the xn-- label and misfile the twin
            # (review finding)
            if rule.startswith("!"):
                target, body = exception, rule[1:]
            elif rule.startswith("*."):
                target, body = wildcard, rule[2:]
            elif rule != "*":
                target, body = exact, rule
            else:
                continue
            for b in filter(None, (body, _puny(body))):
                target.setdefault(b.count(".") + 1, set()).add(b)
    return PslRules(
        exact={j: frozenset(s) for j, s in exact.items()},
        wildcard={j: frozenset(s) for j, s in wildcard.items()},
        exception={j: frozenset(s) for j, s in exception.items()},
    )


_INVALID_HOST = re.compile(r"^\.|\.\.|\.$")


def _let(col: Column, body) -> Column:
    """Let-binding for Column trees: evaluate ``col`` ONCE per row and give
    ``body`` a lambda VARIABLE to reference — ``get(transform(array(col),
    body), 0)``. Without this, every reference in a hand-built expression
    tree re-embeds (and re-evaluates) the whole sub-tree: the PSL probe
    battery referenced the caller's host expression ~50 times, and CASE
    branches block codegen subexpression elimination, so a 4-regex
    url_host chain ran ~50x per row (round-14 decomposition:
    web_domain_cap spent ~55 us/row on a probe battery that costs ~2 us
    evaluated linearly). ``body`` must be a plain unary lambda — a
    default-arg lambda parses as the binary (element, index) form."""
    return F.get(F.transform(F.array(col), body), 0)


def _suffix_len(labels: Column, n: Column, rules: PslRules) -> Column:
    """Label count of the prevailing public suffix for a pre-lowercased,
    pre-split host."""

    def tail(j: int) -> Column:
        # guard: slice past the front would misbehave; '' never probes in
        return F.when(n >= j, F.array_join(F.slice(labels, -j, j), ".")).otherwise(
            F.lit("")
        )

    # longest matching exact/wildcard rule, default * -> 1. A rule only
    # matches a host with at least as many labels as the rule: exact
    # rules get that via tail(j) = '' when n < j; a wildcard *.base has
    # base_labels+1 labels, so it additionally needs n >= j+1 — without
    # that, a host that IS the base ('kobe.jp' under *.kobe.jp) would
    # spuriously match and lose its registrable domain (review finding)
    cands = [F.lit(1)]
    for j, s in rules.exact.items():
        if j >= 2:  # a 1-label exact rule is indistinguishable from '*'
            cands.append(F.when(tail(j).isin(*sorted(s)), F.lit(j)).otherwise(F.lit(1)))
    for j, s in rules.wildcard.items():
        cands.append(
            F.when((n >= j + 1) & tail(j).isin(*sorted(s)), F.lit(j + 1)).otherwise(
                F.lit(1)
            )
        )
    prevailing = F.greatest(*cands) if len(cands) > 1 else cands[0]
    # exceptions prevail over everything, longest exception winning among
    # themselves: ascending wrap order puts the LARGEST j outermost, so
    # it is evaluated first (review finding — descending order inverted
    # the precedence)
    out = prevailing
    for j in sorted(rules.exception):
        out = F.when(
            tail(j).isin(*sorted(rules.exception[j])), F.lit(j - 1)
        ).otherwise(out)
    return out


def public_suffix_registrable(
    host: Column, rules: PslRules | None = None, *, fallback_to_host: bool = False
) -> Column:
    """STRICT registrable domain (the checkPublicSuffix contract):
    lowercased eTLD+1, or NULL when the host is itself a public suffix,
    a bare TLD, or syntactically invalid (leading/trailing/empty
    label). This is the upstream-test-vector surface;
    ``operators.web.registrable_domain`` wraps it with the
    host-fallback the curation operators want (``fallback_to_host=True``
    — inside the let-binding, so the caller's possibly-expensive host
    expression is still evaluated exactly once per row).

    Evaluation shape: the host, its label array, and the prevailing
    suffix length are each bound ONCE via :func:`_let` — the probe
    battery references lambda variables, not copies of the caller's
    expression tree. Still a pure map-only expression: no join, no
    broadcast, no UDF, no shuffle."""
    if rules is None:
        rules = load_psl_rules()

    def with_host(h: Column) -> Column:
        def with_labels(labels: Column) -> Column:
            n = F.size(labels)

            def with_ps(ps: Column) -> Column:
                # registrable = suffix + one label; NULL when the host IS
                # a public suffix (or shorter)
                return F.when(
                    n > ps, F.array_join(F.slice(labels, -(ps + 1), ps + 1), ".")
                )

            return _let(_suffix_len(labels, n, rules), with_ps)

        core = F.when(
            h.rlike(_INVALID_HOST.pattern) | (h == ""), F.lit(None)
        ).otherwise(_let(F.split(h, r"\."), with_labels))
        return F.coalesce(core, h) if fallback_to_host else core

    return _let(F.lower(host), with_host)
