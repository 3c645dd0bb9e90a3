"""From-scratch phone-number matching kernel.

Replicates the observable behaviour of ``phonenumbers.PhoneNumberMatcher`` +
``format_number`` (the reference's dependency, ``single_value.py:1070-1127``)
for the regions its test-suite exercises (NANP/US and GB,
``tests/test_single_value.py:737-772``) plus generic ``+CC`` international
numbers.  Full libphonenumber parity is explicitly out of scope
(SURVEY.md §2.3 #18); scope is documented here and in the op docstring.

r05 widening (VERDICT r04 #8): digit-pattern validation (not just length)
for the big non-European plans BR/JP/CN/MX, and six new regions
(ZA/SG/NZ/ID/AE/AR).

Number formats mirror ``phonenumbers.PhoneNumberFormat`` integer values.
"""

from __future__ import annotations

import re
from typing import List, Optional


class PhoneNumberFormat:
    E164 = 0
    INTERNATIONAL = 1
    NATIONAL = 2
    RFC3966 = 3


# Candidate runs: digits with (), spaces, dots or dashes between groups,
# optionally led by + or (.  Validation filters non-phones afterwards.
_CANDIDATE_RE = re.compile(
    r"(?<![\d\w])"
    r"(\+?\(?\d[\d .\-()]{4,18}\d)"
)

# NANP: area code and exchange must start with 2-9.
_NANP_RE = re.compile(r"^([2-9]\d{2})([2-9]\d{2})(\d{4})$")

# country code -> (min national digits, max national digits)
_CC_RULES = {
    "1": (10, 10),
    "44": (9, 10),
    "33": (9, 9),
    "49": (6, 11),
    "34": (9, 9),
    "39": (6, 11),
    "81": (9, 10),
    "86": (10, 11),
    "91": (10, 10),
    "61": (9, 9),
    "55": (10, 11),
    "7": (10, 10),
    "52": (10, 10),
    "31": (9, 9),
    "46": (7, 9),
    # r04 widening (VERDICT r03 #7)
    "48": (9, 9),
    "90": (10, 10),
    "41": (9, 9),
    "32": (8, 9),
    # r04 widening #2
    "43": (7, 11),
    "45": (8, 8),
    "47": (8, 8),
    "351": (9, 9),
    "353": (7, 9),
    "82": (9, 10),
    # r05 widening (VERDICT r04 #8): non-European plans
    "27": (9, 9),
    "65": (8, 8),
    "64": (8, 10),
    "62": (8, 12),
    "971": (8, 9),
    "54": (10, 10),
    # r05 widening #2: the remaining big plans by web-page volume
    "966": (9, 9),
    "20": (8, 10),
    "66": (8, 9),
    "84": (9, 10),
    "60": (8, 10),
    "63": (8, 10),
    "972": (8, 9),
    "234": (7, 10),
    "56": (9, 9),
    "57": (10, 10),
}

# Digit-pattern validation beyond length, applied at VALID leniency (the
# NANP rule above is the cc=1 case).  Only crisp, stable plan rules are
# encoded — the kind libphonenumber's VALID leniency also enforces:
#   BR: 11-digit numbers are mobiles and carry the 2016 "ninth digit"
#       (3rd digit 9); 10-digit landlines start [2-5] after the area code.
#   JP: national numbers are 9 digits (landline) or 10 digits starting
#       70/80/90 (mobile/paging) once the trunk 0 is stripped.
#   CN: mobiles are 11 digits starting 1[3-9]; landlines 10-11 digits
#       with a nonzero area code.
#   MX: uniform 10-digit plan, nonzero leading digit.
_CC_PATTERNS = {
    "55": re.compile(r"^(?:\d{2}9\d{8}|[1-9]\d[2-5]\d{7})$"),
    "81": re.compile(r"^(?:[1-9]\d{8}|[789]0\d{8})$"),
    # 1[3-9]: 11-digit mobile; 10: Beijing; 2x: 2-digit metro codes;
    # [3-9]xx: 3-digit area codes with 7-8 digit subscribers
    "86": re.compile(r"^(?:1[3-9]\d{9}|10\d{8}|2\d{9}|[3-9]\d{9,10})$"),
    "52": re.compile(r"^[1-9]\d{9}$"),
    # r05 widening #2 — again only the crisp rules:
    #   TH: 9-digit mobiles start 6/8/9, 8-digit landlines start 2-7
    #   VN: 9-digit mobiles start 3/5/7/8/9, 10-digit landlines start 2
    #   IL: 5x mobiles, 7[2-9] VoIP, single-digit metro landlines
    #   SA: 5x mobiles, 1[1-7] province landlines
    #   CL: uniform 9 digits, nonzero lead
    #   CO: 3x 10-digit mobiles, 60x unified landlines
    "66": re.compile(r"^(?:[689]\d{8}|[2-7]\d{7})$"),
    "84": re.compile(r"^(?:[35789]\d{8}|2\d{9})$"),
    "972": re.compile(r"^(?:5\d{8}|7[2-9]\d{7}|[23489]\d{7})$"),
    "966": re.compile(r"^(?:5\d{8}|1[1-7]\d{7})$"),
    "56": re.compile(r"^[2-9]\d{8}$"),
    "57": re.compile(r"^(?:3\d{9}|60[1-8]\d{7})$"),
}

_REGION_CC = {"US": "1", "CA": "1", "GB": "44", "FR": "33", "DE": "49",
              "ES": "34", "IT": "39", "JP": "81", "CN": "86", "IN": "91",
              "AU": "61", "BR": "55", "RU": "7", "MX": "52", "NL": "31",
              "SE": "46", "PL": "48", "TR": "90", "CH": "41", "BE": "32",
              "AT": "43", "DK": "45", "NO": "47", "PT": "351", "IE": "353",
              "KR": "82",
              "ZA": "27", "SG": "65", "NZ": "64", "ID": "62", "AE": "971",
              "AR": "54",
              "SA": "966", "EG": "20", "TH": "66", "VN": "84", "MY": "60",
              "PH": "63", "IL": "972", "NG": "234", "CL": "56", "CO": "57"}

#: phonenumbers.Leniency subset: POSSIBLE (0) = length-only checks,
#: VALID (1, the matcher default) = full pattern validation.  The stricter
#: grouping leniencies (2, 3) fall back to VALID — documented subset.
LENIENCY_POSSIBLE = 0
LENIENCY_VALID = 1


def _split_cc(digits: str, possible: bool = False) -> Optional[tuple]:
    """Split an international digit string into (cc, national)."""
    for cc_len in (1, 2, 3):
        cc = digits[:cc_len]
        if cc in _CC_RULES:
            lo, hi = _CC_RULES[cc]
            national = digits[cc_len:]
            if lo <= len(national) <= hi:
                if cc == "1" and not possible and not _NANP_RE.match(national):
                    continue
                pat = _CC_PATTERNS.get(cc)
                if pat is not None and not possible and not pat.match(national):
                    continue
                return cc, national
    return None


def _validate(candidate: str, region: str,
              possible: bool = False) -> Optional[tuple]:
    """Return (cc, national_digits) or None.  ``possible`` applies the
    POSSIBLE leniency: length bounds only, no digit-pattern validation."""
    has_plus = candidate.lstrip().startswith("+")
    digits = re.sub(r"\D", "", candidate)
    if has_plus:
        return _split_cc(digits, possible)
    # National dialing in `region`
    cc = _REGION_CC.get(region)
    if cc is None:
        return None
    if cc == "1":
        if len(digits) == 11 and digits.startswith("1"):
            digits = digits[1:]
        if len(digits) == 10 and (possible or _NANP_RE.match(digits)):
            return "1", digits
        return None
    if cc == "44":
        if digits.startswith("0") and 10 <= len(digits) <= 11:
            return "44", digits[1:]
        return None
    lo, hi = _CC_RULES[cc]
    if digits.startswith("0"):
        digits = digits[1:]
    if lo <= len(digits) <= hi:
        pat = _CC_PATTERNS.get(cc)
        if pat is not None and not possible and not pat.match(digits):
            return None
        return cc, digits
    return None


def _format(cc: str, national: str, num_format: int) -> str:
    if num_format == PhoneNumberFormat.E164:
        return f"+{cc}{national}"
    if num_format == PhoneNumberFormat.RFC3966:
        return f"tel:+{cc}-{national}"
    if cc == "1":
        body = f"({national[:3]}) {national[3:6]}-{national[6:]}"
        if num_format == PhoneNumberFormat.NATIONAL:
            return body
        return f"+1 {national[:3]}-{national[3:6]}-{national[6:]}"
    if cc == "44":
        # London-style 2-digit area code grouping: 20 XXXX XXXX
        if national.startswith("20") and len(national) == 10:
            groups = f"20 {national[2:6]} {national[6:]}"
        elif len(national) == 10:
            groups = f"{national[:4]} {national[4:]}"
        else:
            groups = national
        if num_format == PhoneNumberFormat.NATIONAL:
            return f"0{groups}"
        return f"+44 {groups}"
    # r05: national/international grouping for the plans whose grouping is
    # uniform enough to be crisp (libphonenumber metadata conventions);
    # other regions keep the bare-national fallback below (documented
    # subset).
    if cc == "33" and len(national) == 9:
        # FR: 0X XX XX XX XX / +33 X XX XX XX XX
        groups = " ".join([national[0]] + [national[i:i + 2]
                                           for i in range(1, 9, 2)])
        if num_format == PhoneNumberFormat.NATIONAL:
            return f"0{groups}"
        return f"+33 {groups}"
    if cc == "61" and len(national) == 9:
        # AU: 0X XXXX XXXX / +61 X XXXX XXXX
        groups = f"{national[0]} {national[1:5]} {national[5:]}"
        if num_format == PhoneNumberFormat.NATIONAL:
            return f"0{groups}"
        return f"+61 {groups}"
    if cc == "81" and len(national) in (9, 10):
        # JP: mobiles (10 digits, [789]0 prefix) 090-1234-5678; 9-digit
        # landlines grouped for the 1-digit metro codes (03/06) 03-1234-5678
        if len(national) == 10:
            groups = f"{national[:2]}-{national[2:6]}-{national[6:]}"
        else:
            groups = f"{national[0]}-{national[1:5]}-{national[5:]}"
        if num_format == PhoneNumberFormat.NATIONAL:
            return f"0{groups}"
        return f"+81 {groups}"
    if cc == "55" and len(national) in (10, 11):
        # BR: (11) 98765-4321 / (11) 3256-7890; international drops the ()
        area, sub = national[:2], national[2:]
        hyph = f"{sub[:-4]}-{sub[-4:]}"
        if num_format == PhoneNumberFormat.NATIONAL:
            return f"({area}) {hyph}"
        return f"+55 {area} {hyph}"
    if num_format == PhoneNumberFormat.NATIONAL:
        return national
    return f"+{cc} {national}"


def extract_phone_numbers(
    text: str,
    region: str = "US",
    num_format: int = PhoneNumberFormat.E164,
    leniency: object = None,
    max_tries: int = 65535,
) -> List[str]:
    """Find and format phone numbers in free text.

    ``leniency`` follows the phonenumbers Leniency subset: POSSIBLE (0)
    validates length bounds only; VALID (1, default when None) applies the
    full digit-pattern checks; stricter grouping levels fall back to VALID.
    ``max_tries`` mirrors the PhoneNumberMatcher contract ("the maximum
    number of invalid numbers to try before giving up on the text"): each
    candidate that fails validation spends one try, valid matches are free,
    and the scan stops once the budget is spent (0 = no scan at all).
    """
    if leniency is None:
        leniency_val = LENIENCY_VALID
    elif isinstance(leniency, str):
        leniency_val = {"POSSIBLE": 0, "VALID": 1, "STRICT_GROUPING": 2,
                        "EXACT_GROUPING": 3}[leniency.upper()]
    else:
        leniency_val = int(leniency)
    possible = leniency_val == LENIENCY_POSSIBLE
    tries = int(max_tries)
    out: List[str] = []
    for m in _CANDIDATE_RE.finditer(text or ""):
        if tries <= 0:
            break
        cand = m.group(1)
        if sum(ch.isdigit() for ch in cand) < 7:
            tries -= 1
            continue
        v = _validate(cand, region, possible)
        if v is None:
            tries -= 1
            continue
        out.append(_format(v[0], v[1], num_format))
    return out
