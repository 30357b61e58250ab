"""Unit tests for the PII/profanity scrubber (FIXTURES.md content-mix cases)."""

from __future__ import annotations

from fineweb_legal_spark.scrub import scrub_text


def test_emails():
    assert scrub_text("mail me at a.b+c@corp-mail.example.org now") == "mail me at [EMAIL] now"
    assert scrub_text("no-at-sign.example.org stays") == "no-at-sign.example.org stays"


def test_ssn_formats_and_near_misses():
    assert scrub_text("ssn 123-45-6789 ok") == "ssn [SSN] ok"
    assert scrub_text("raw 987654321 run") == "raw [SSN] run"
    # version string must NOT be scrubbed
    assert scrub_text("v1.2.3-45-6789 build") == "v1.2.3-45-6789 build"
    # ISBN-13 (13 digits) must NOT be scrubbed
    assert scrub_text("ISBN 9780262033848") == "ISBN 9780262033848"
    # digit-adjacent runs must NOT be scrubbed
    assert scrub_text("id 1234567890") == "id 1234567890"


def test_phone_formats():
    assert scrub_text("call (415) 555-0134 now") == "call [PHONE] now"
    assert scrub_text("call 212-555-0188.") == "call [PHONE]."
    assert scrub_text("call 212.555.0188 now") == "call [PHONE] now"
    assert scrub_text("call +1 650 555 0101 now") == "call [PHONE] now"
    # too-short number untouched
    assert scrub_text("650.555.042 stays") == "650.555.042 stays"


def test_profanity_word_boundaries():
    assert scrub_text("well damn that failed") == "well [CENSORED] that failed"
    assert scrub_text("DAMN and Hell") == "[CENSORED] and [CENSORED]"
    # substring-embedded words must NOT match
    assert scrub_text("hello shellfish") == "hello shellfish"


def test_order_email_before_ssn_before_phone():
    s = "a@b.co 123-45-6789 415-555-0134"
    assert scrub_text(s) == "[EMAIL] [SSN] [PHONE]"


def test_none_passthrough():
    assert scrub_text(None) is None
    assert scrub_text("") == ""


def test_gated_scrub_equals_ungated_cascade():
    # the necessary-condition gates (round 4) must never change output:
    # property-check against the ungated five-pass cascade on adversarial
    # text mixing PII shapes, gate-boundary fragments, and unicode
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fineweb_legal_spark import spec

    def ungated(text):
        t = spec.EMAIL_RE.sub(spec.EMAIL_TOKEN, text)
        t = spec.SSN_RE.sub(spec.SSN_TOKEN, t)
        t = spec.SSN9_RE.sub(spec.SSN_TOKEN, t)
        t = spec.PHONE_RE.sub(spec.PHONE_TOKEN, t)
        t = spec.PROFANITY_RE.sub(spec.PROFANITY_TOKEN, t)
        return t

    frag = st.sampled_from(
        [
            "a@b.co", "@", "x@y", "123-45-6789", "123456789", "12345678",
            "415-555-0134", "(415) 555-0134", "+1 650 555 0101", "damn",
            "DAMN", "shellfish", "Hell", "1.2.123-45-6789", "99", " ",
            " ", "ü@ü.de", "123", "-", ".", "sucks9123456789",
        ]
    )
    chunk = st.one_of(frag, st.text(max_size=8))

    @settings(max_examples=300, deadline=None)
    @given(st.lists(chunk, max_size=12))
    def check(parts):
        s = "".join(parts)
        assert scrub_text(s) == ungated(s)

    check()
