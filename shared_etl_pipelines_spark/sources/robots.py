"""robots.txt parsing and URL-allowance evaluation (RFC 9309).

A crawl corpus is only usable if its collection respected (and its
audits can re-verify) robots exclusion — re-checking crawl allowance
against the robots snapshot is a standard curation pass. This module
implements the public RFC 9309 semantics:

- groups: consecutive ``User-agent`` lines share the following rules;
  the group whose product token matches exactly wins over the ``*``
  group (only one group applies);
- rule matching: ``Allow``/``Disallow`` path patterns match as octet
  prefixes, with ``*`` (any sequence) and ``$`` (end anchor) wildcards;
- precedence: the MOST OCTETS of matched pattern wins; equal lengths
  resolve to ALLOW (RFC 9309 §2.2.2);
- unknown/malformed lines are skipped (the spec demands liberal
  parsing); an absent robots file allows everything;
- an empty Disallow value ("Disallow:") matches nothing.
"""

from __future__ import annotations

import re

__all__ = ["parse_robots", "robots_allowed"]


def parse_robots(text: str) -> list[tuple[list[str], list[tuple[bool, str]]]]:
    """robots.txt -> [(agent_tokens, [(is_allow, pattern), ...]), ...].
    Consecutive User-agent lines open one group; rules before any
    User-agent line are ignored (no group), per RFC 9309."""
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    collecting_agents = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents and agents:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(val.lower())
            collecting_agents = True
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if agents:
                if val == "":
                    continue  # empty pattern matches nothing
                rules.append((key == "allow", val))
        else:
            # sitemap / crawl-delay / unknown lines: skipped, but they
            # terminate a User-agent run (RFC 9309 liberal parsing)
            collecting_agents = False
    if agents:
        groups.append((agents, rules))
    return groups


def _pattern_matches(pattern: str, path: str) -> bool:
    rx = ""
    for ch in pattern:
        if ch == "*":
            rx += ".*"
        elif ch == "$":
            rx += "$"
        else:
            rx += re.escape(ch)
    return re.match(rx, path) is not None


def robots_allowed(
    groups: list[tuple[list[str], list[tuple[bool, str]]]],
    agent: str,
    path: str,
) -> tuple[bool, str]:
    """(allowed, matched_pattern) for ``path`` under ``agent``.

    Group selection: the group listing the exact product token wins
    over the ``*`` group; no applicable group allows everything.
    Precedence: longest matched pattern (octets, wildcards counted as
    written); ties resolve to allow per RFC 9309 §2.2.2."""
    agent = agent.lower()
    chosen = None
    for agents, rules in groups:
        if agent in agents:
            chosen = rules
            break
    if chosen is None:
        for agents, rules in groups:
            if "*" in agents:
                chosen = rules
                break
    if chosen is None:
        return True, ""
    best: tuple[int, bool, str] | None = None
    for is_allow, pattern in chosen:
        if _pattern_matches(pattern, path):
            key = (len(pattern), is_allow)
            if best is None or key > (best[0], best[1]):
                best = (len(pattern), is_allow, pattern)
    if best is None:
        return True, ""
    return best[1], best[2]
