"""Greek analysis: GreekLowerCaseFilter + GreekStemmer.

Reference: lucene/analysis/common/src/java/org/apache/lucene/
analysis/el/{GreekLowerCaseFilter,GreekStemmer}.java — the stemmer of
Ntais/Saroukos (22 numbered rules: 20 "short" rules, the rule-21
long-suffix list taken only when no short rule fired, and the rule-22
comparative/superlative strip that always runs).

Faithfulness notes (mirroring the generated-code behavior, not the
paper): rule8's dialect-variant strips keep the reference's operator
precedence (`len > 7 && A || B || C` — the length floor guards only
the first literal); exception sets match the WHOLE remaining stem
exactly while the secondary guards are endsWith checks; add-backs
restore the leading characters of the stripped suffix (rules 10/11/
18/19 overwrite some of them, which this rebuild models by appending
the explicit replacement text). Verified against the reference's
TestGreekStemmer pair set (checkOneTerm through GreekAnalyzer =
lowercase+stem). Pure str→str.
"""

from __future__ import annotations

__all__ = ["greek_lowercase", "greek_stem"]

_EL_FOLD = {
    0x03C2: "σ",
    0x0386: "α", 0x03AC: "α",
    0x0388: "ε", 0x03AD: "ε",
    0x0389: "η", 0x03AE: "η",
    0x038A: "ι", 0x03AA: "ι", 0x03AF: "ι", 0x03CA: "ι", 0x0390: "ι",
    0x038E: "υ", 0x03AB: "υ", 0x03CD: "υ", 0x03CB: "υ", 0x03B0: "υ",
    0x038C: "ο", 0x03CC: "ο",
    0x038F: "ω", 0x03CE: "ω",
}


def greek_lowercase(word: str) -> str:
    return "".join(
        _EL_FOLD.get(ord(ch)) or ch.lower() for ch in word)


_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")

_EXC4 = {"θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"}
_EXC6 = {"αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ",
         "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ",
         "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ",
         "συνομηλ", "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν",
         "πρωτοδ", "σερτ", "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ",
         "χασ"}
_EXC7 = {"αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
         "πεθ", "πικρ", "ποτ", "σιχ", "χ"}
_EXC8A = {"τρ", "τσ"}
_EXC8B = {"βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
          "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ",
          "ν", "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ",
          "σαρακατσ", "σουλτ", "τσαρλατ", "ορφ", "τσιγγ", "τσοπ",
          "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ",
          "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ", "ζωντ",
          "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ",
          "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ",
          "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ",
          "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ",
          "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ",
          "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
          "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ",
          "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ",
          "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"}
_EXC9 = {"αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
         "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
         "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ",
         "θαρρ", "θ"}
_EXC12A = {"π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"}
_EXC12B = {"αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ",
           "νισ"}
_EXC13 = {"διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"}
_EXC14 = {"φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
          "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ",
          "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ",
          "δε", "δευτερευ", "καθαρευ", "πλε", "τσα"}
_EXC15A = {"αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ",
           "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ",
           "δερβεν", "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ",
           "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
           "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
           "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ",
           "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"}
_EXC15B = {"ψοφ", "ναυλοχ"}
_EXC16 = {"ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν"}
_EXC17 = {"ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
          "ευχρ", "κοινοχρ", "παλιμψ"}
_EXC18 = {"ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"}
_EXC19 = {"παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ"}


def _vowel(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS


def _vowel_no_y(s: str) -> bool:
    return bool(s) and s[-1] in _VOWELS_NO_Y


def _rule0(s):
    n = len(s)
    if n > 9 and s.endswith(("καθεστωτοσ", "καθεστωτων")):
        return s[:n - 4]
    if n > 8 and s.endswith(("γεγονοτοσ", "γεγονοτων")):
        return s[:n - 4]
    if n > 8 and s.endswith("καθεστωτα"):
        return s[:n - 3]
    if n > 7 and s.endswith(("τατογιου", "τατογιων")):
        return s[:n - 4]
    if n > 7 and s.endswith("γεγονοτα"):
        return s[:n - 3]
    if n > 7 and s.endswith("καθεστωσ"):
        return s[:n - 2]
    if (n > 6 and s.endswith("σκαγιου")) or s.endswith(
            ("σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
             "περατοσ", "περατων", "τερατοσ", "τερατων")):
        return s[:n - 4]
    if n > 6 and s.endswith("τατογια"):
        return s[:n - 3]
    if n > 6 and s.endswith("γεγονοσ"):
        return s[:n - 2]
    if n > 5 and s.endswith(("φαγιου", "φαγιων", "σογιου", "σογιων")):
        return s[:n - 4]
    if n > 5 and s.endswith(("σκαγια", "ολογια", "κρεατα", "περατα",
                             "τερατα")):
        return s[:n - 3]
    if n > 4 and s.endswith(("φαγια", "σογια", "φωτοσ", "φωτων")):
        return s[:n - 3]
    if n > 4 and s.endswith(("κρεασ", "περασ", "τερασ")):
        return s[:n - 2]
    if n > 3 and s.endswith("φωτα"):
        return s[:n - 2]
    if n > 2 and s.endswith("φωσ"):
        return s[:n - 1]
    return s


_R1_KEEP = ("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι", "νταντ",
            "κυρ", "θει", "πεθερ")
_R2_KEEP = ("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")
_R3_KEEP = ("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ", "φλ",
            "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")


def _rule1(s):
    if len(s) > 4 and s.endswith(("αδεσ", "αδων")):
        s = s[:-4]
        if not s.endswith(_R1_KEEP):
            s += "αδ"
    return s


def _rule2(s):
    if len(s) > 4 and s.endswith(("εδεσ", "εδων")):
        s = s[:-4]
        if s.endswith(_R2_KEEP):
            s += "εδ"
    return s


def _rule3(s):
    if len(s) > 5 and s.endswith(("ουδεσ", "ουδων")):
        s = s[:-5]
        if s.endswith(_R3_KEEP):
            s += "ουδ"
    return s


def _rule4(s):
    if len(s) > 3 and s.endswith(("εωσ", "εων")):
        s = s[:-3]
        if s in _EXC4:
            s += "ε"
    return s


def _rule5(s):
    if len(s) > 2 and s.endswith("ια"):
        s = s[:-2]
        if _vowel(s):
            s += "ι"
    elif len(s) > 3 and s.endswith(("ιου", "ιων")):
        s = s[:-3]
        if _vowel(s):
            s += "ι"
    return s


def _rule6(s):
    removed = False
    if len(s) > 3 and s.endswith(("ικα", "ικο")):
        s = s[:-3]
        removed = True
    elif len(s) > 4 and s.endswith(("ικου", "ικων")):
        s = s[:-4]
        removed = True
    if removed and (_vowel(s) or s in _EXC6):
        s += "ικ"
    return s


def _rule7(s):
    if len(s) == 5 and s.endswith("αγαμε"):
        return s[:-1]
    if len(s) > 7 and s.endswith("ηθηκαμε"):
        s = s[:-7]
    elif len(s) > 6 and s.endswith("ουσαμε"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("αγαμε", "ησαμε", "ηκαμε")):
        s = s[:-5]
    if len(s) > 3 and s.endswith("αμε"):
        s = s[:-3]
        if s in _EXC7:
            s += "αμ"
    return s


_R9_KEEP = ("οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
            "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
            "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
            "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ")


def _rule8(s):
    removed = False
    # reference operator precedence: the length floor guards only the
    # first literal of each group
    if len(s) > 8 and s.endswith("ιουντανε"):
        s = s[:-8]
        removed = True
    elif (len(s) > 7 and s.endswith("ιοντανε")) or s.endswith(
            ("ουντανε", "ηθηκανε")):
        s = s[:-7]
        removed = True
    elif (len(s) > 6 and s.endswith("ιοτανε")) or s.endswith(
            ("οντανε", "ουσανε")):
        s = s[:-6]
        removed = True
    elif (len(s) > 5 and s.endswith("αγανε")) or s.endswith(
            ("ησανε", "οτανε", "ηκανε")):
        s = s[:-5]
        removed = True
    if removed and s in _EXC8A:
        s += "αγαν"
    if len(s) > 3 and s.endswith("ανε"):
        s = s[:-3]
        if _vowel_no_y(s) or s in _EXC8B:
            s += "αν"
    return s


def _rule9(s):
    if len(s) > 5 and s.endswith("ησετε"):
        s = s[:-5]
    if len(s) > 3 and s.endswith("ετε"):
        s = s[:-3]
        if s in _EXC9 or _vowel_no_y(s) or s.endswith(_R9_KEEP):
            s += "ετ"
    return s


def _rule10(s):
    if len(s) > 5 and s.endswith(("οντασ", "ωντασ")):
        s = s[:-5]
        if len(s) == 3 and s.endswith("αρχ"):
            s += "οντ"
        if s.endswith("κρε"):
            s += "ωντ"
    return s


def _rule11(s):
    if len(s) > 6 and s.endswith("ομαστε"):
        s = s[:-6]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    elif len(s) > 7 and s.endswith("ιομαστε"):
        s = s[:-7]
        if len(s) == 2 and s.endswith("ον"):
            s += "ομαστ"
    return s


def _rule12(s):
    if len(s) > 5 and s.endswith("ιεστε"):
        s = s[:-5]
        if s in _EXC12A:
            s += "ιεστ"
    if len(s) > 4 and s.endswith("εστε"):
        s = s[:-4]
        if s in _EXC12B:
            s += "εστ"
    return s


def _rule13(s):
    if len(s) > 6 and s.endswith("ηθηκεσ"):
        s = s[:-6]
    elif len(s) > 5 and s.endswith(("ηθηκα", "ηθηκε")):
        s = s[:-5]
    removed = False
    if len(s) > 4 and s.endswith("ηκεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ηκα", "ηκε")):
        s = s[:-3]
        removed = True
    if removed and (s in _EXC13 or s.endswith(
            ("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ"))):
        s += "ηκ"
    return s


def _rule14(s):
    removed = False
    if len(s) > 5 and s.endswith("ουσεσ"):
        s = s[:-5]
        removed = True
    elif len(s) > 4 and s.endswith(("ουσα", "ουσε")):
        s = s[:-4]
        removed = True
    if removed and (s in _EXC14 or _vowel(s) or s.endswith(
            ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
             "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ"))):
        s += "ουσ"
    return s


def _rule15(s):
    removed = False
    if len(s) > 4 and s.endswith("αγεσ"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("αγα", "αγε")):
        s = s[:-3]
        removed = True
    if removed:
        cond1 = s in _EXC15A or s.endswith(
            ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ",
             "λοχ", "σμην"))
        cond2 = s in _EXC15B or s.endswith("κολλ")
        if cond1 and not cond2:
            s += "αγ"
    return s


def _rule16(s):
    removed = False
    if len(s) > 4 and s.endswith("ησου"):
        s = s[:-4]
        removed = True
    elif len(s) > 3 and s.endswith(("ησε", "ησα")):
        s = s[:-3]
        removed = True
    if removed and s in _EXC16:
        s += "ησ"
    return s


def _rule17(s):
    if len(s) > 4 and s.endswith("ηστε"):
        s = s[:-4]
        if s in _EXC17:
            s += "ηστ"
    return s


def _rule18(s):
    removed = False
    if len(s) > 6 and s.endswith(("ησουνε", "ηθουνε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουνε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC18:
        s += "ουν"
    return s


def _rule19(s):
    removed = False
    if len(s) > 6 and s.endswith(("ησουμε", "ηθουμε")):
        s = s[:-6]
        removed = True
    elif len(s) > 4 and s.endswith("ουμε"):
        s = s[:-4]
        removed = True
    if removed and s in _EXC19:
        s += "ουμ"
    return s


def _rule20(s):
    if len(s) > 5 and s.endswith(("ματων", "ματοσ")):
        return s[:-3]
    if len(s) > 4 and s.endswith("ματα"):
        return s[:-2]
    return s


def _rule21(s):
    n = len(s)
    if n > 9 and s.endswith("ιοντουσαν"):
        return s[:n - 9]
    if n > 8 and s.endswith(("ιομασταν", "ιοσασταν", "ιουμαστε",
                             "οντουσαν")):
        return s[:n - 8]
    if n > 7 and s.endswith(("ιεμαστε", "ιεσαστε", "ιομουνα",
                             "ιοσαστε", "ιοσουνα", "ιουνται",
                             "ιουνταν", "ηθηκατε", "ομασταν",
                             "οσασταν", "ουμαστε")):
        return s[:n - 7]
    if n > 6 and s.endswith(("ιομουν", "ιονταν", "ιοσουν", "ηθειτε",
                             "ηθηκαν", "ομουνα", "οσαστε", "οσουνα",
                             "ουνται", "ουνταν", "ουσατε")):
        return s[:n - 6]
    if n > 5 and s.endswith(("αγατε", "ιεμαι", "ιεται", "ιεσαι",
                             "ιοταν", "ιουμα", "ηθεισ", "ηθουν",
                             "ηκατε", "ησατε", "ησουν", "ομουν",
                             "ονται", "ονταν", "οσουν", "ουμαι",
                             "ουσαν")):
        return s[:n - 5]
    if n > 4 and s.endswith(("αγαν", "αμαι", "ασαι", "αται", "ειτε",
                             "εσαι", "εται", "ηδεσ", "ηδων", "ηθει",
                             "ηκαν", "ησαν", "ησει", "ησεσ", "ομαι",
                             "οταν")):
        return s[:n - 4]
    if n > 3 and s.endswith(("αει", "εισ", "ηθω", "ησω", "ουν",
                             "ουσ")):
        return s[:n - 3]
    if n > 2 and s.endswith(("αν", "ασ", "αω", "ει", "εσ", "ησ",
                             "οι", "οσ", "ου", "υσ", "ων")):
        return s[:n - 2]
    if n > 1 and _vowel(s):
        return s[:n - 1]
    return s


def _rule22(s):
    if s.endswith(("εστερ", "εστατ")):
        return s[:-5]
    if s.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")):
        return s[:-4]
    return s


_RULES = (_rule0, _rule1, _rule2, _rule3, _rule4, _rule5, _rule6,
          _rule7, _rule8, _rule9, _rule10, _rule11, _rule12, _rule13,
          _rule14, _rule15, _rule16, _rule17, _rule18, _rule19,
          _rule20)


def greek_stem(word: str) -> str:
    """GreekStemmer.stem (el/GreekStemmer.java:43-74); expects
    greek_lowercase()d input."""
    s = word
    if len(s) < 4:
        return s
    orig = len(s)
    for rule in _RULES:
        s = rule(s)
    if len(s) == orig:
        s = _rule21(s)
    return _rule22(s)
