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


# 18 graph aspects (reference resource/graph_aspects.json, loaded at
# formalism/amr/tools.py:36-44); dict layout mirrors the JSON resource.
GRAPH_ASPECTS: dict[str, dict] = {
    "AGENT": {
        "associated_rel": [
            ":arg0"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "CAUSE": {
        "associated_rel": [
            ":cause"
        ],
        "associated_concept_group": "cause",
        "search_in_frame_descr": {
            " cause ": ":cause"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "CONCEPT": {
        "associated_rel": [
            ":instance"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 0,
        "add_parent": 0,
        "add_predicates": 0
    },
    "FOCUS": {
        "associated_rel": [
            ":root"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "INSTRUMENT": {
        "associated_rel": [
            ":instrument"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {
            " instrument ": ":instrument",
            " tool ": ":instrument",
            "instrumental": ":instrument"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "LOCATION (spatial)": {
        "associated_rel": [
            ":location",
            ":path",
            ":destination",
            ":direction"
        ],
        "associated_concept_group": "locations",
        "search_in_frame_descr": {
            " location ": ":location",
            " path ": ":path",
            " destination ": ":destination",
            " direction ": ":direction"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "MATHS": {
        "associated_rel": [],
        "associated_concept_group": "math",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "NER": {
        "associated_rel": [
            ":name"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "PATIENT": {
        "associated_rel": [
            ":arg1",
            ":arg2",
            ":arg3",
            ":arg4",
            ":arg5",
            ":arg6",
            ":arg7",
            ":arg8",
            ":arg9"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "POLARITY": {
        "associated_rel": [
            ":polarity"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "POSSESSION": {
        "associated_rel": [
            ":poss"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {
            " owner ": ":poss",
            " possession ": ":poss-of"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "PURPOSE": {
        "associated_rel": [
            ":purpose"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {
            " purpose ": ":purpose"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "QUANTIFIER": {
        "associated_rel": [
            ":quant"
        ],
        "associated_concept_group": "quantities",
        "search_in_frame_descr": {
            " quantity ": ":quant",
            " amount ": ":quant"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "QUESTION": {
        "associated_rel": [],
        "associated_concept_group": "questions",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 0,
        "add_parent": 1,
        "add_predicates": 1
    },
    "SRL-core": {
        "associated_rel": [
            ":arg0",
            ":arg1",
            ":arg2",
            ":arg3",
            ":arg4",
            ":arg5",
            ":arg6",
            ":arg7",
            ":arg8",
            ":arg9"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "TIME (temporal)": {
        "associated_rel": [
            ":time",
            ":duration",
            ":frequency"
        ],
        "associated_concept_group": "dates",
        "search_in_frame_descr": {
            " time ": ":time",
            " duration ": ":duration",
            " frequency ": ":frequency"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "TOPIC": {
        "associated_rel": [
            ":topic"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {
            " topic ": ":topic"
        },
        "subgraph_extraction_range": 2,
        "add_parent": 0,
        "add_predicates": 1
    },
    "WIKI": {
        "associated_rel": [
            ":wiki"
        ],
        "associated_concept_group": "",
        "search_in_frame_descr": {},
        "subgraph_extraction_range": 0,
        "add_parent": 0,
        "add_predicates": 0
    }
}

# concept groups (resource/concept_groups.json, tools.py:47-55)
CONCEPT_GROUPS: dict[str, list[str]] = {
    "animate": [
        "person",
        "family",
        "animal",
        "language",
        "nationality",
        "ethnic-group",
        "regional-group",
        "religious-group",
        "political-movement"
    ],
    "cause": [
        "cause-01"
    ],
    "dates": [
        "date-entity",
        "date-interval"
    ],
    "event": [
        "incident",
        "natural-disaster",
        "earthquake",
        "war",
        "conference",
        "game",
        "festival"
    ],
    "facility": [
        "airport",
        "station",
        "port",
        "tunnel",
        "bridge",
        "road",
        "railway-line",
        "canal",
        "building",
        "theater",
        "museum",
        "palace",
        "hotel",
        "worship-place",
        "market",
        "sports-facility",
        "park",
        "zoo",
        "amusement-park"
    ],
    "locations": [
        "city",
        "city-district",
        "county",
        "state",
        "province",
        "territory",
        "country",
        "local-region",
        "country-region",
        "world-region",
        "continent",
        "ocean",
        "sea",
        "lake",
        "river",
        "gulf",
        "bay",
        "strait",
        "canal",
        "peninsula",
        "mountain",
        "volcano",
        "valley",
        "canyon",
        "island",
        "desert",
        "forest moon",
        "planet",
        "star",
        "constellation"
    ],
    "math": [
        "sum-of",
        "product-of"
    ],
    "molecular-physical-entity": [
        "small-molecule",
        "protein",
        "protein-family",
        "protein-segment",
        "amino-acid",
        "macro-molecular-complex",
        "enzyme",
        "nucleic-acid",
        "pathway",
        "gene",
        "dna-sequence",
        "cell",
        "cell-line",
        "species",
        "taxon",
        "disease",
        "medical-condition"
    ],
    "organization": [
        "company",
        "government-organization",
        "military",
        "criminal-organization",
        "political-party",
        "market-sector",
        "school",
        "university",
        "research-institute",
        "team",
        "league"
    ],
    "product": [
        "vehicle",
        "ship",
        "aircraft",
        "aircraft-type",
        "spaceship",
        "car-make",
        "work-of-art",
        "picture",
        "music",
        "show",
        "broadcast-program"
    ],
    "publication": [
        "book",
        "newspaper",
        "magazine",
        "journal"
    ],
    "quantities": [
        "monetary-quantity",
        "distance-quantity",
        "area-quantity",
        "volume-quantity",
        "temporal-quantity",
        "frequency-quantity",
        "speed-quantity",
        "acceleration-quantity",
        "mass-quantity",
        "force-quantity",
        "pressure-quantity",
        "energy-quantity",
        "power-quantity",
        "voltage-quantity (zap!)",
        "charge-quantity",
        "potential-quantity",
        "resistance-quantity",
        "inductance-quantity",
        "magnetic-field-quantity",
        "magnetic-flux-quantity",
        "radiation-quantity",
        "concentration-quantity",
        "temperature-quantity",
        "score-quantity",
        "fuel-consumption-quantity",
        "seismic-quantity"
    ],
    "questions": [
        "amr-unknown"
    ],
    "technical": [
        "award",
        "law",
        "court-decision",
        "treaty",
        "music-key",
        "musical-note",
        "food-dish",
        "writing-script",
        "variable",
        "program"
    ]
}


# ---------------------------------------------------------------------------
# PropBank frame table → frame-conditioned edge-relabeling rules
# ---------------------------------------------------------------------------
#
# The reference enhances fine-grained scoring by translating core roles to
# explicit non-core roles using PropBank frame argument descriptions
# (formalism/amr/tools.py:58-124): ``read_frame_table`` parses
# ``propbank-amr-frames-arg-descr.txt`` (downloaded at runtime — tools.py:58-82,
# unavailable offline) and ``invert_frame_table`` (tools.py:118-128) scans each
# role description for the aspect table's ``search_in_frame_descr`` strings,
# yielding rules like ``{"control-01": {":arg2": ":instrument"}}`` consumed by
# ``SyntacticEdgeRelabelingTransformer`` (graph_transforms.py:192-222).
#
# Offline the reference falls back to an empty dict (tools.py:88-93).  We ship
# the same parse + inversion functions plus a small bundled frame table —
# hand-written from public PropBank/AMR frame knowledge, in the exact file
# format the reference downloads — so the relabeling path is exercised by
# default and a user with the full file can load it via ``parse_frame_table``.

FRAME_TABLE_TEXT = """\
control-01  ARG0: controller  ARG1: thing controlled  ARG2: instrument
cut-01  ARG0: intentional cutter  ARG1: thing cut  ARG2: medium, instrument  ARG3: pieces, cuttings
hit-01  ARG0: hitter, agent  ARG1: thing hit, target  ARG2: instrument of hitting
stab-01  ARG0: stabber  ARG1: entity stabbed  ARG2: instrument, tool used
write-01  ARG0: writer  ARG1: thing written  ARG2: benefactive  ARG3: medium, instrument
go-02  ARG0: entity in motion, goer  ARG1: extent  ARG2: start point  ARG3: end point, destination  ARG4: direction or path
put-01  ARG0: putter  ARG1: thing put  ARG2: where put, location
move-01  ARG0: mover  ARG1: moved entity  ARG2: destination
travel-01  ARG0: traveler  ARG1: path or location traveled  ARG2: destination
pay-01  ARG0: payer, buyer  ARG1: money or attention  ARG2: being paid, destination of attention  ARG3: commodity, paid for what, purpose
own-01  ARG0: owner  ARG1: possession, thing owned
have-03  ARG0: owner  ARG1: possession
cause-01  ARG0: cause, agent  ARG1: effect, thing caused
last-01  ARG1: thing lasting  ARG2: duration
wait-01  ARG0: waiter  ARG1: entity or event waited for  ARG2: duration of waiting
measure-01  ARG0: measurer  ARG1: thing measured  ARG2: size, quantity measured  ARG3: basis of comparison
talk-01  ARG0: talker  ARG1: topic of talk  ARG2: hearer
teach-01  ARG0: teacher  ARG1: subject, topic taught  ARG2: student
aim-01  ARG0: aimer  ARG1: purpose, goal aimed at  ARG2: instrument aimed
schedule-01  ARG0: scheduler  ARG1: event scheduled  ARG2: scheduled time
"""


def parse_frame_table(text: str, lower: bool = True) -> dict[str, dict[str, str]]:
    """Parse the PropBank frame file format into
    ``{pred: {":argN": " description "}}`` — exact mirror of the reference's
    ``read_frame_table`` line handling (formalism/amr/tools.py:85-115):
    lines split on two-spaces+``arg``, role descriptions get ``", "``/``". "``
    collapsed to spaces, whitespace normalized, and a single leading/trailing
    space added so word-boundary search strings like ``" instrument "`` match.
    """
    frame_table: dict[str, dict[str, str]] = {}
    for line in text.split("\n"):
        if not line:
            continue
        if lower:
            line = line.lower()
        spl = line.split("  arg")
        pred = spl[0]
        frame_table[pred] = {}
        for elm in spl[1:]:
            elm = elm.replace(", ", " ").replace(". ", " ")
            role_descr = elm.split(": ")
            frame_table[pred][":arg" + role_descr[0]] = (
                " " + " ".join(role_descr[1].split()) + " "
            )
    return frame_table


def invert_frame_table(
    frame_table: dict[str, dict[str, str]], aspects: dict[str, dict]
) -> dict[str, dict[str, str]]:
    """Turn frame argument descriptions into per-predicate edge-relabel rules
    ``{pred: {":argN": ":newrel"}}`` by scanning each description for every
    aspect's ``search_in_frame_descr`` strings — exact mirror of the
    reference's ``invert_frame_table`` (formalism/amr/tools.py:118-128),
    including its last-aspect-wins overwrite order.
    """
    pred_role_map: dict[str, dict[str, str]] = {}
    for aspect in aspects:
        strings = aspects[aspect]["search_in_frame_descr"].keys()
        for pred in frame_table:
            for role in frame_table[pred]:
                for string in strings:
                    if string in frame_table[pred][role]:
                        pred_role_map.setdefault(pred, {})[role] = aspects[aspect][
                            "search_in_frame_descr"
                        ][string]
    return pred_role_map


FRAME_TABLE: dict[str, dict[str, str]] = parse_frame_table(FRAME_TABLE_TEXT)


def semantic_edge_rules() -> dict[str, dict[str, str]]:
    """Default PropBank relabel rules from the bundled frame table — the
    analog of AMRSubgraphExtractor's init (formalism/amr/tools.py:215-221)
    when the frame file is present."""
    return invert_frame_table(FRAME_TABLE, GRAPH_ASPECTS)
