"""AMR formalism rule tables, encoded as plain Python data.

These reproduce public AMR-guidelines knowledge used by the reference
(reification list per https://github.com/amrisi/amr-guidelines, loaded by
the reference at formalism/amr/tools.py:11-33; aspect/concept-group tables
at tools.py:36-55).  Rules are *data*, shipped as package constants and
broadcast to executors as tiny DataFrames.

``REIFY_RULES``: relation → (concept, arg_to_source, arg_to_target),
lowercased, e.g. ``(x, :location, y)`` reifies to
``(z, :instance, be-located-at-91), (z, :arg1, x), (z, :arg2, y)``;
dereification is the inverse.  Where the guidelines list several concepts
for one relation (``:poss``), only the first participates, matching the
reference loader's first-wins behavior.
"""

from __future__ import annotations

REIFY_RULES: dict[str, tuple[str, str, str]] = {
    ":accompanier": ("accompany-01", ":arg1", ":arg0"),
    ":age": ("age-01", ":arg1", ":arg2"),
    ":beneficiary": ("benefit-01", ":arg0", ":arg1"),
    ":concession": ("have-concession-91", ":arg1", ":arg2"),
    ":condition": ("have-condition-91", ":arg1", ":arg2"),
    ":degree": ("have-degree-91", ":arg1", ":arg2"),
    ":destination": ("be-destined-for-91", ":arg1", ":arg2"),
    ":duration": ("last-01", ":arg1", ":arg2"),
    ":example": ("exemplify-01", ":arg1", ":arg0"),
    ":extent": ("have-extent-91", ":arg1", ":arg2"),
    ":frequency": ("have-frequency-91", ":arg1", ":arg2"),
    ":instrument": ("have-instrument-91", ":arg1", ":arg2"),
    ":li": ("have-li-91", ":arg1", ":arg2"),
    ":location": ("be-located-at-91", ":arg1", ":arg2"),
    ":manner": ("have-manner-91", ":arg1", ":arg2"),
    ":mod": ("have-mod-91", ":arg1", ":arg2"),
    ":name": ("have-name-91", ":arg1", ":arg2"),
    ":ord": ("have-ord-91", ":arg1", ":arg2"),
    ":part": ("have-part-91", ":arg1", ":arg2"),
    ":polarity": ("have-polarity-91", ":arg1", ":arg2"),
    ":poss": ("own-01", ":arg1", ":arg0"),
    ":purpose": ("have-purpose-91", ":arg1", ":arg2"),
    ":quant": ("have-quant-91", ":arg1", ":arg2"),
    ":source": ("be-from-91", ":arg1", ":arg2"),
    ":subevent": ("have-subevent-91", ":arg1", ":arg2"),
    ":time": ("be-temporally-at-91", ":arg1", ":arg2"),
    ":topic": ("concern-02", ":arg0", ":arg1"),
    ":value": ("have-value-91", ":arg1", ":arg2"),
}

# concept → (relation, arg_to_source, arg_to_target): the dereification view
DEREIFY_RULES: dict[str, tuple[str, str, str]] = {
    concept: (rel, a1, a2) for rel, (concept, a1, a2) in REIFY_RULES.items()
}
