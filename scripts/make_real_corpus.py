"""Generate a small real-English corpus in the reference's nlp_parse.py
JSON format (tests/fixtures/real_corpus/{train_new,test_new}.json).

The reference's KBP/NYT/BioInfer corpora are download-only, so this is
hand-authored natural English: varied sentence templates (different
clause structures, appositives, fronted modifiers, distractors) filled
with a fictional-but-natural entity roster, with GOLD hand-checked PTB
POS per token — independent of the engine's rule tagger, so it doubles
as the tagger's real-text agreement benchmark
(tests/test_real_corpus.py).

Format per line (nlp_parse.py:146-155): articleId, sentId, tokens, pos,
entityMentions [{start,end,labels}], relationMentions
[{em1Start,em1End,em2Start,em2End,numOfEMBetween,labels}].  Spans are
0-based end-exclusive.  One deliberately malformed line lands in
train_new.json to exercise the corrupt-line quarantine.

Deterministic: fillers rotate through rosters by fixed index arithmetic;
no RNG.  Usage: python scripts/make_real_corpus.py
"""

from __future__ import annotations

import json
import os

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "real_corpus")

PERSONS = ["Clara Mendez", "David Okafor", "Priya Raman", "Thomas Beck",
           "Elena Vasquez", "Marcus Webb", "Alice Chen", "Robert Hale",
           "Nina Petrova", "Samuel Ortiz", "Grace Liu", "Daniel Moreau",
           "Fatima Noor", "Victor Ramos", "Hannah Stein", "Omar Haddad"]
ORGS = ["Halcyon Systems", "Northbridge Capital", "Veridian Labs",
        "Crestline Media", "Atlas Foundry", "Summit Analytics",
        "Ridgeline Partners", "Beacon Works", "Harborview Group",
        "Quintessa Biotech", "Stratus Dynamics", "Pinewood Holdings"]
LOCS = ["Porterville", "Eastgate", "Milford", "San Marcos", "Fairhaven",
        "Lakewood County", "Bellmore", "Dunmore", "Westfall",
        "Kingsbridge"]
# (container, contained) pairs for /location/location/contains and
# (neighborhood=contained, city=container) for neighborhood_of
LOC_PAIRS = [("Lakewood County", "Porterville"),
             ("Lakewood County", "Eastgate"),
             ("San Marcos", "Milford"),
             ("Fairhaven", "Eastgate"),
             ("San Marcos", "Bellmore"),
             ("Fairhaven", "Kingsbridge"),
             ("Lakewood County", "Dunmore"),
             ("San Marcos", "Westfall")]

BP = "/business/person/company"
PB = "/people/person/place_of_birth"
OH = "/organization/organization/headquarters"
LC = "/location/location/contains"
PL = "/people/person/place_lived"
CF = "/business/company/founders"
NB = "/location/neighborhood/neighborhood_of"
NONE = "None"

# gold PTB tags for every non-entity template word (hand-checked)
LEX = {
    "the": "DT", "a": "DT", "an": "DT", "its": "PRP$", "his": "PRP$",
    "her": "PRP$", "their": "PRP$", "both": "DT", "that": "IN",
    "works": "VBZ", "worked": "VBN", "joined": "VBD", "resigned": "VBD",
    "announced": "VBD", "said": "VBD", "confirmed": "VBD", "say": "VBP",
    "lead": "VB", "runs": "VBZ", "was": "VBD", "is": "VBZ",
    "were": "VBD", "had": "VBD", "will": "MD", "born": "VBN",
    "studied": "VBD", "moved": "VBD", "grew": "VBD", "lives": "VBZ",
    "headquartered": "VBN", "based": "VBN", "reported": "VBD",
    "employs": "VBZ", "includes": "VBZ", "mentioned": "VBN",
    "visited": "VBD", "founded": "VBN", "open": "VB", "opened": "VBD",
    "covers": "VBZ", "serves": "VBZ", "remains": "VBZ", "spoke": "VBD",
    "as": "IN", "at": "IN", "of": "IN", "in": "IN", "for": "IN",
    "on": "IN", "by": "IN", "from": "IN", "with": "IN", "after": "IN",
    "before": "IN", "within": "IN", "about": "IN", "to": "TO",
    "and": "CC", "but": "CC", "senior": "JJ", "new": "JJ",
    "longtime": "JJ", "strong": "JJ", "last": "JJ", "annual": "JJ",
    "northern": "JJ", "several": "JJ", "engineer": "NN", "analyst": "NN",
    "employee": "NN", "team": "NN", "merger": "NN", "research": "NN",
    "division": "NN", "history": "NN", "college": "NN", "family": "NN",
    "office": "NN", "firm": "NN", "report": "NN", "district": "NN",
    "town": "NN", "region": "NN", "spring": "NN", "decade": "NN",
    "spokesman": "NN", "headquarters": "NN", "earnings": "NNS",
    "hundreds": "NNS", "colleagues": "NNS", "plans": "NNS",
    "residents": "NNS", "analytics": "NN", "nearly": "RB",
    "ago": "RB", "there": "RB", "away": "RB", "still": "RB",
    "now": "RB", "up": "RP", "where": "WRB", "she": "PRP", "he": "PRP",
    "friday": "NNP", "reporters": "NNS", "this": "DT", "week": "NN",
    "not": "RB", "yet": "RB", "profitable": "JJ", "company": "NN",
    "grown": "VBN", "has": "VBZ", "quickly": "RB", "area": "NN",
    "downtown": "NN", "review": "NN", "which": "WDT", "who": "WP", "lies": "VBZ",
    "near": "IN",
    # round-5 additions (PL/CF/NB templates); single-tag constraint, so
    # "lived" is used only as simple past (VBD), never "has lived"
    "lived": "VBD", "years": "NNS", "neighborhood": "NN",
    "founder": "NN", "neighbors": "NNS",
}

# templates: text with {P}/{O}/{L}/{L1}/{L2} placeholders; (rel, subj,
# obj) names which placeholders form the labeled pair
T_TRAIN = [
    (BP, "P", "O", "{P} works as a senior engineer at {O} ."),
    (BP, "P", "O", "Before the merger , {P} had worked for {O} in the "
                   "research division ."),
    (BP, "P", "O", "{O} announced that {P} will lead its new analytics "
                   "team ."),
    (BP, "P", "O", "{P} , a longtime employee of {O} , resigned on "
                   "Friday ."),
    (BP, "P", "O", "Colleagues say {P} joined {O} nearly a decade ago ."),
    (PB, "P", "L", "{P} was born in {L} and studied history there ."),
    (PB, "P", "L", "Born in {L} , {P} moved away after college ."),
    (PB, "P", "L", "A spokesman confirmed that {P} was born in {L} ."),
    (PB, "P", "L", "{P} , who was born in {L} , spoke to reporters this "
                   "week ."),
    (OH, "O", "L", "{O} is headquartered in {L} ."),
    (OH, "O", "L", "{O} , based in {L} , reported strong annual "
                   "earnings ."),
    (OH, "O", "L", "The headquarters of {O} in {L} employs hundreds ."),
    (OH, "O", "L", "From its headquarters in {L} , {O} serves the "
                   "northern region ."),
    # decorrelates the "has grown quickly" context from CF/NB: without
    # an OH carrier of this n-gram, held-out "which is based in ... has
    # grown quickly" mentions drift to /business/company/founders
    (OH, "O", "L", "{O} , which is headquartered in {L} , has grown "
                   "quickly ."),
    (LC, "L1", "L2", "{L1} includes the district of {L2} ."),
    (LC, "L1", "L2", "The town of {L2} lies within {L1} ."),
    (LC, "L1", "L2", "Residents of {L2} , a district of {L1} , visited "
                     "the new office ."),
    (PL, "P", "L", "{P} lived in {L} for several years ."),
    (PL, "P", "L", "{P} now lives in {L} ."),
    (PL, "P", "L", "Neighbors say {P} lived in {L} before the merger ."),
    (PL, "P", "L", "After college , {P} moved to {L} and still lives "
                   "there ."),
    (CF, "O", "P", "{O} was founded by {P} ."),
    (CF, "O", "P", "{O} , founded by {P} , has grown quickly ."),
    (CF, "O", "P", "{P} is a founder of {O} ."),
    (NB, "L2", "L1", "{L2} is a neighborhood of {L1} ."),
    (NB, "L2", "L1", "The {L2} neighborhood of {L1} has grown "
                     "quickly ."),
    (NB, "L2", "L1", "Residents of {L2} , a neighborhood of {L1} , "
                     "visited the new office ."),
    (NONE, "P", "L", "{P} visited {L} last spring ."),
    (NONE, "P", "O", "{P} and {O} were both mentioned in the annual "
                     "report ."),
    (NONE, "O", "L", "{O} opened an office in {L} last week ."),
    (NONE, "P", "O", "{P} spoke about {O} on Friday ."),
]
T_TEST = [
    (BP, "P", "O", "{P} now runs the analytics division at {O} ."),
    (BP, "P", "O", "{P} joined {O} after college and still works "
                   "there ."),
    (PB, "P", "L", "{P} was born in {L} , where her family still "
                   "lives ."),
    (PB, "P", "L", "Born in {L} , {P} grew up near the downtown area ."),
    (OH, "O", "L", "{O} remains headquartered in {L} ."),
    (OH, "O", "L", "{O} , which is based in {L} , has grown quickly ."),
    (LC, "L1", "L2", "{L1} includes the town of {L2} ."),
    (PL, "P", "L", "{P} still lives in {L} ."),
    (CF, "O", "P", "{O} , which was founded by {P} , reported strong "
                   "annual earnings ."),
    (NB, "L2", "L1", "{L2} remains a neighborhood of {L1} ."),
    (NONE, "P", "L", "{P} visited {L} for the annual review ."),
    (NONE, "O", "L", "{O} opened an office in {L} this spring ."),
]

ETYPE = {"P": "/person", "O": "/organization", "L": "/location",
         "L1": "/location", "L2": "/location"}


def tag(tok: str) -> str:
    if tok in (".", ",", "?", "!", ":", ";"):
        return tok
    t = LEX.get(tok.lower())
    if t is None:
        raise KeyError(f"no gold tag for template word {tok!r}")
    return t


def fill(rel, s_ph, o_ph, template, fillers):
    toks, pos, ems = [], [], {}
    for piece in template.split(" "):
        if piece.startswith("{") and piece.endswith("}"):
            ph = piece[1:-1]
            name_toks = fillers[ph].split(" ")
            ems[ph] = (len(toks), len(toks) + len(name_toks))
            toks += name_toks
            pos += ["NNP"] * len(name_toks)
        else:
            toks.append(piece)
            pos.append(tag(piece))
    entity_mentions = [
        {"start": s, "end": e, "labels": [ETYPE[ph]]}
        for ph, (s, e) in sorted(ems.items(), key=lambda kv: kv[1])]
    (s1, e1), (s2, e2) = ems[s_ph], ems[o_ph]
    lo, hi = min(e1, e2), max(s1, s2)
    n_between = sum(1 for _, (s, e) in ems.items()
                    if s >= lo and e <= hi and (s, e) not in ((s1, e1),
                                                              (s2, e2)))
    rel_mentions = [{"em1Start": s1, "em1End": e1, "em2Start": s2,
                     "em2End": e2, "numOfEMBetween": n_between,
                     "labels": [rel]}]
    return toks, pos, entity_mentions, rel_mentions


def build(templates, combo_count, art_prefix, offset=0):
    lines = []
    sent_in_article, art_no = 0, 0
    for ci in range(combo_count):
        for ti, (rel, s_ph, o_ph, tmpl) in enumerate(templates):
            k = ci * len(templates) + ti + offset
            fillers = {
                "P": PERSONS[k % len(PERSONS)],
                "O": ORGS[(k + k // len(ORGS)) % len(ORGS)],
                "L": LOCS[k % len(LOCS)],
            }
            lp = LOC_PAIRS[k % len(LOC_PAIRS)]
            fillers["L1"], fillers["L2"] = lp
            toks, pos, ems, rms = fill(rel, s_ph, o_ph, tmpl, fillers)
            lines.append(json.dumps({
                "articleId": f"{art_prefix}-{art_no:03d}",
                "sentId": sent_in_article,
                "tokens": toks, "pos": pos,
                "entityMentions": ems, "relationMentions": rms,
            }))
            sent_in_article += 1
            if sent_in_article == 3:
                sent_in_article, art_no = 0, art_no + 1
    return lines


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    train = build(T_TRAIN, combo_count=5, art_prefix="train")
    # one malformed line exercises the PERMISSIVE corrupt-record path
    train.insert(37, '{"articleId": "train-broken", "tokens": [unclosed')
    test = build(T_TEST, combo_count=3, art_prefix="test", offset=3)
    with open(os.path.join(OUT_DIR, "train_new.json"), "w") as f:
        f.write("\n".join(train) + "\n")
    with open(os.path.join(OUT_DIR, "test_new.json"), "w") as f:
        f.write("\n".join(test) + "\n")
    print(f"train: {len(train)} lines (1 corrupt), test: {len(test)} "
          f"lines -> {OUT_DIR}")


if __name__ == "__main__":
    main()
