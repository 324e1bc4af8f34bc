"""Analyzer parity goldens, ported from the reference's JUnit suites:

- NLPTokenizerTest.java:27-43  (cleanTwitter+lower+stop+stem chain)
- JsonDocumentStreamTest.java:50-78  (default chain, multi-field concat)
- TabTokenizerTest semantics (tab split, no post-processing)
- Stopwords.java:14-39 (punctuation-run + case-insensitive list)
"""

import pytest

from elasticsearch_nlp_classifier_spark.analyzer import (
    CLEAN_TWITTER,
    DEFAULT,
    STOPWORDS,
    Analyzer,
    get_analyzer,
    remove_stopwords,
    stem,
    twokenize,
)


# --- NLPTokenizerTest.java:27-43 goldens (cleanTwitter variant) -----------
@pytest.mark.parametrize(
    "sentence,expected",
    [
        ("Hello World", ["hello", "world"]),
        (
            "Heard about #earthquakes is different cities, stay safe everyone.",
            ["heard", "earthquak", "differ", "citi", "stay", "safe", "everyon"],
        ),
        (
            "Burning Man Ablaze! by Turban Diva http://t.co/hodWosAmWS via @Etsy",
            ["burn", "man", "ablaz", "turban", "diva", "via"],
        ),
    ],
)
def test_nlp_tokenizer_goldens(sentence, expected):
    assert CLEAN_TWITTER.tokenize(sentence) == expected


# --- JsonDocumentStreamTest.java:50-78 (default chain, 2 fields) ----------
def test_multi_field_default_chain():
    assert DEFAULT.tokenize_fields("hello world", "goodbye world") == [
        "hello", "world", "goodby", "world",
    ]
    assert DEFAULT.tokenize_fields("pen pineapple", "apple pen") == [
        "pen", "pineappl", "appl", "pen",
    ]


def test_multi_field_lowercase_only():
    simple = Analyzer(split="twitter", use_stopwords=False, use_stemming=False)
    assert simple.tokenize_fields("hello world", "goodbye world") == [
        "hello", "world", "goodbye", "world",
    ]
    assert simple.tokenize_fields("pen pineapple", "apple pen") == [
        "pen", "pineapple", "apple", "pen",
    ]


def test_tab_tokenizer():
    assert get_analyzer("tab").tokenize("Pen\tPineapple\tApple\tPen") == [
        "Pen", "Pineapple", "Apple", "Pen",
    ]


# --- Twokenizer protocol ---------------------------------------------------
def test_twokenize_protects_urls_and_contractions():
    toks = twokenize("I can't believe http://t.co/abc works :-)")
    assert "ca" in toks and "n't" in toks
    assert "http://t.co/abc" in toks
    assert ":-)" in toks


def test_twokenize_edge_punct():
    assert twokenize('"quoted"') == ['"', "quoted", '"']
    assert twokenize("well, done.") == ["well", ",", "done", "."]


# --- Stopwords -------------------------------------------------------------
def test_stopword_list_size():
    assert len(STOPWORDS) == 127


def test_remove_stopwords():
    assert remove_stopwords(["The", "quick", "IS", "fox", "", "!!", "--"]) == [
        "quick", "fox",
    ]
    # '--' is a run of '-'; '!?' is not a single-char run so it survives
    assert remove_stopwords(["!?"]) == ["!?"]


# --- Porter2 ---------------------------------------------------------------
@pytest.mark.parametrize(
    "word,expected",
    [
        ("earthquakes", "earthquak"),
        ("different", "differ"),
        ("cities", "citi"),
        ("everyone", "everyon"),
        ("burning", "burn"),
        ("ablaze", "ablaz"),
        ("goodbye", "goodby"),
        ("pineapple", "pineappl"),
        ("apple", "appl"),
        ("heard", "heard"),
        ("safe", "safe"),
        ("stay", "stay"),
        ("turban", "turban"),
        ("via", "via"),
        # published Snowball sample vocabulary spot-checks
        ("consign", "consign"),
        ("consigned", "consign"),
        ("consigning", "consign"),
        ("consolingly", "consol"),
        ("generate", "generat"),
        ("generically", "generic"),
        ("agreed", "agre"),
        ("skies", "sky"),
        ("dying", "die"),
        ("news", "news"),
        ("proceed", "proceed"),
        ("exceeding", "exceed"),
        ("knitting", "knit"),
        ("hopping", "hop"),
        ("hoping", "hope"),
        ("tied", "tie"),
        ("ties", "tie"),
        ("cries", "cri"),
        ("by", "by"),
        ("say", "say"),
        ("national", "nation"),
        ("rational", "ration"),
        ("sensational", "sensat"),
        ("conditional", "condit"),
        ("sky", "sky"),
        ("happiness", "happi"),
        ("fortunately", "fortun"),
    ],
)
def test_porter2(word, expected):
    assert stem(word) == expected


# --- JVM expr vs Python chain parity for simple_code ------------------------
# wand_topk analyzes queries driver-side with SIMPLE_CODE.tokenize while
# the index is built with the pure-builtin simple_code_tokens expression;
# both must produce identical tokens for any input.
def test_simple_code_jvm_python_parity(spark):
    from pyspark.sql import functions as F

    from elasticsearch_nlp_classifier_spark.analyzer.chain import SIMPLE_CODE
    from elasticsearch_nlp_classifier_spark.analyzer.spark_udfs import (
        simple_code_tokens,
    )

    samples = [
        "def main(argv): return 0  # TODO fix",
        "Error: HTTP/1.1 404 NOT FOUND!!",
        "CamelCase snake_case kebab-case x509 v2.0.1",
        "   ",
        "",
        "日本語 mixed ascii123",
        "a\tb\nc\r\nd",
        "UPPER lower 0042 0x1F",
        None,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    jvm = [r[0] for r in df.select(simple_code_tokens("text")).collect()]
    py = [SIMPLE_CODE.tokenize(s) if s is not None else [] for s in samples]
    assert jvm == py


def test_code_jvm_python_parity(spark):
    """The index build's hot path is the pure-builtin ``code_tokens``
    expression; the driver-side query analyzer and the pandas-UDF
    fallback use ``CODE.tokenize``.  Pin them equal on adversarial
    samples AND on a slice of the real synthetic corpus (ASCII source
    text — the parity domain; Java/Python regex classes differ only on
    non-ASCII digits/whitespace)."""
    from elasticsearch_nlp_classifier_spark.analyzer.chain import CODE
    from elasticsearch_nlp_classifier_spark.analyzer.spark_udfs import (
        code_tokens,
    )
    from elasticsearch_nlp_classifier_spark.corpus.generator import (
        gen_corpus_pdf,
    )

    samples = [
        "def main(argv): return 0  # TODO fix",
        "x += 1;;; y <<= 2 ==== !!!",
        "The THE the And aNd",          # stopwords, case-insensitive
        "self.value = self._private__",
        "... --- ,,, .,.",              # punct runs (mixed run survives)
        "for i in range(10): print(i)",
        "",
        "   ",
        "a-b a_b a.b 0x1F 42 _lead",
        # non-ASCII + null: (?U) puts Java \\d/\\S on Python's Unicode
        # semantics; null coalesces to '' like the pandas chain
        "h\u00e9llo w\u00f6rld \u0661\u0662\u0663",
        "\u65e5\u672c\u8a9e mixed ascii123 \u00fc\u00df",
        None,
    ] + list(gen_corpus_pdf(50)["content"])
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    jvm = [r[0] for r in df.select(code_tokens("text")).collect()]
    py = [CODE.tokenize(s) if s is not None else [] for s in samples]
    assert jvm == py
