"""Compliance-framework registry — the Spark port of the reference's
``rules/data/frameworks/`` package (cis.py / soc2.py / iso27001.py /
nist_ai_rmf.py): per-framework metadata, the control-title lookup used by
formatters, and coverage helpers that map rules onto controls.

Only controls that at least one rule maps to are titled here (the
reference's convention); titles are brief summaries, not framework copy.
"""

from __future__ import annotations

from cartography_spark.plans.rules import Framework, Rule

# ---------------------------------------------------------------------------
# Framework identities (reference frameworks/__init__.py registry)
# ---------------------------------------------------------------------------

CIS_AWS = {
    "name": "CIS AWS Foundations Benchmark",
    "short_name": "cis",
    "scope": "aws",
    "revision": "5.0",
}
SOC2 = {
    "name": "SOC 2: Trust Services Criteria",
    "short_name": "soc2",
    "scope": "tsc",
    "revision": "2022",
}
ISO27001 = {
    "name": "ISO/IEC 27001 Annex A",
    "short_name": "iso27001",
    "scope": "annex-a",
    "revision": "2022",
}
NIST_AI_RMF = {
    "name": "NIST AI Risk Management Framework",
    "short_name": "nist-ai-rmf",
    "scope": "ai",
    "revision": "1.0",
}

FRAMEWORKS = {f["short_name"]: f for f in (CIS_AWS, SOC2, ISO27001, NIST_AI_RMF)}

# Control-title lookups: only controls some rule maps to (brief summaries).
CONTROL_TITLES: dict[str, dict[str, str]] = {
    "cis": {
        "1.12": "Disable credentials unused for 45 days or more",
        "1.14": "Rotate access keys regularly",
        "2.1.4": "Block public access on storage buckets",
        "3.1": "Record API activity in all regions",
        "5.2": "Restrict ingress from 0.0.0.0/0 to admin ports",
        "5.6": "Require instance metadata service v2",
    },
    "soc2": {
        "cc6.1": "Logical access controls protect information assets",
        "cc6.2": "Register and authorize users before granting credentials",
        "cc6.3": "Modify or remove access on role change (least privilege)",
        "cc6.6": "Protect against external access beyond system boundaries",
        "cc6.7": "Restrict and protect information in transmission",
        "cc7.2": "Monitor components for anomalies and security events",
        "a1.2": "Operate backup and recovery infrastructure",
    },
    "iso27001": {
        "a.5.15": "Access control rules based on business requirements",
        "a.5.16": "Manage the full identity lifecycle",
        "a.8.2": "Restrict and manage privileged access rights",
        "a.8.13": "Maintain and test information backups",
        "a.8.16": "Monitor networks and systems for anomalous activity",
        "a.8.20": "Secure, segregate and control networks",
        "a.8.24": "Use cryptography, including in transit",
    },
    "nist-ai-rmf": {
        "govern 1.2": "Integrate trustworthy-AI practice into policies",
        "map 3.4": "Document operator and oversight roles",
        "measure 2.7": "Assess security and resilience of AI systems",
    },
}


def fw(short_name: str, requirement: str) -> Framework:
    """Build a Framework mapping from the registry + control title table."""
    meta = FRAMEWORKS[short_name.lower()]
    title = CONTROL_TITLES.get(short_name.lower(), {}).get(requirement.lower())
    return Framework(
        name=meta["name"],
        short_name=meta["short_name"],
        requirement=requirement,
        scope=meta["scope"],
        revision=meta["revision"],
        control_title=title,
    )


def framework_coverage(rules: list[Rule] | tuple[Rule, ...]) -> list[dict]:
    """(framework, requirement, rule) coverage rows — the data behind the
    reference's framework report (rules/cli.py frameworks listing)."""
    out = []
    for rule in rules:
        for f in rule.frameworks:
            out.append(
                {
                    "framework": f.short_name,
                    "revision": f.revision,
                    "requirement": f.requirement,
                    "control_title": f.control_title,
                    "rule_id": rule.rule_id,
                }
            )
    return sorted(out, key=lambda r: (r["framework"], r["requirement"], r["rule_id"]))
