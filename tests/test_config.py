"""Config parsing tests.

The binary_oid_ranges corpus is transcribed verbatim from the
reference's table-driven test
(``tests/binary_oid_ranges_input_test.go:10-33``): same inputs, same
accept/reject decisions, same error-message substrings.
"""

import pytest

from pg_pb3_ld_spark.config import (
    EngineConfig,
    OptionError,
    oid_in_ranges,
    parse_binary_oid_ranges,
)

CORPUS = [
    ("foo", True, "invalid input syntax for integer"),
    ("0", True, "oid can't be InvalidOid"),
    ("0-0", True, "oid can't be InvalidOid"),
    ("0-1", True, "oid can't be InvalidOid"),
    ("-1", True, "invalid input syntax for integer"),
    ("1", False, ""),
    ("4294967295", False, ""),
    ("4294967296", True, "oids can't be larger than OID_MAX"),
    ("1,", True, "invalid input syntax for binary_oid_ranges"),
    ("1-", True, "invalid input syntax for integer"),
    ("1-,", True, "invalid input syntax for binary_oid_ranges"),
    ("1,2", False, ""),
    ("2-1", True, "the upper bound of a range can't be lower than its lower bound"),
    ("1,1-2", True, "overlaps with or precedes range"),
    ("1-3,2-4", True, "overlaps with or precedes range"),
    ("3-4,1-2", True, "overlaps with or precedes range"),
    ("1,2,3,4,5,6,7,8,9,10", False, ""),
    ("1-2,3,4-5", False, ""),
]


@pytest.mark.parametrize("inp,fails,err", CORPUS)
def test_binary_oid_ranges_corpus(inp, fails, err):
    if fails:
        with pytest.raises(OptionError) as exc:
            parse_binary_oid_ranges(inp)
        assert err in str(exc.value)
    else:
        ranges = parse_binary_oid_ranges(inp)
        assert ranges == sorted(ranges)


def test_empty_input_means_no_ranges():
    # utils.c:82-86 — whitespace-only input returns NULL, not an error
    assert parse_binary_oid_ranges("") == []
    assert parse_binary_oid_ranges("   ") == []


def test_membership_early_exit_semantics():
    # decoder/fsd.c:211-227 ordered closed-interval test
    ranges = parse_binary_oid_ranges("1-2,5,10-20")
    hits = [o for o in range(25) if oid_in_ranges(ranges, o)]
    assert hits == [1, 2, 5] + list(range(10, 21))


def test_engine_config_validation():
    cfg = EngineConfig(binary_oid_ranges="20-25,700-701")
    assert cfg.binary_output_for(23)
    assert cfg.binary_output_for(700)
    assert not cfg.binary_output_for(17)
    with pytest.raises(OptionError):
        EngineConfig(type_oids_mode="bogus")
    with pytest.raises(OptionError):
        EngineConfig(formats_mode="bogus")
    with pytest.raises(OptionError):
        EngineConfig(num_buckets=0)
