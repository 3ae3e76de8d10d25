"""HTML DOM extraction (SURVEY §2.1 S2, §2.4 J6): the reference scrapes
the parcel id from a property-detail page with an XPath sibling join —
``//th[contains(.,'Parcel ID')]/following-sibling::td[1]//span``
(crs_ui_bot.py:211-228) — then NBSP-normalizes and strips (223).

Spark form: the page is a string column; parsing runs in an
Arrow-batched ``mapInPandas`` (one parser instance per batch, bytes
never leave the executor). The parser here is stdlib ``html.parser``
(lxml isn't in this container; the operator structure — schema,
batching, null contract — is identical with lxml dropped in)."""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

from pyspark.sql import DataFrame


class _SiblingExtract(HTMLParser):
    """th('Parcel ID') → following td text: the XPath sibling join as a
    tiny state machine over the tag stream."""

    def __init__(self, label: str):
        super().__init__()
        self.label = label
        self._in_th = False
        self._th_matched = False
        self._in_td_after_match = False
        self.result: str | None = None

    def handle_starttag(self, tag, attrs):
        if tag == "th":
            self._in_th = True
        elif tag == "td" and self._th_matched and self.result is None:
            self._in_td_after_match = True

    def handle_endtag(self, tag):
        if tag == "th":
            self._in_th = False
        elif tag == "td":
            self._in_td_after_match = False

    def handle_data(self, data):
        if self._in_th and self.label in data:
            self._th_matched = True
        elif self._in_td_after_match and self.result is None and data.strip():
            self.result = data

    @classmethod
    def extract(cls, html: str, label: str) -> str | None:
        if not html:
            return None
        p = cls(label)
        try:
            p.feed(html)
        except Exception:
            return None  # crs_ui_bot.py:226-228 null-on-failure contract
        if p.result is None:
            return None
        # NBSP → space, then strip (crs_ui_bot.py:223)
        return p.result.replace(" ", " ").strip()


def extract_field(df: DataFrame, html_col: str, label: str, out_col: str) -> DataFrame:
    """Extract the td following the th containing ``label`` from an HTML
    string column; null on parse failure or miss."""
    import pandas as pd

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} string"]
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[out_col] = [
                _SiblingExtract.extract(h, label) for h in pdf[html_col]
            ]
            yield out

    return df.mapInPandas(_parse, schema)


class _AllPairs(HTMLParser):
    """Collect every th→following-td pair in document order — the UDTF
    generalization of :class:`_SiblingExtract` (one row out per field
    instead of one scalar)."""

    def __init__(self):
        super().__init__()
        self._in_th = False
        self._pending_label: str | None = None
        self._in_td = False
        self.pairs: list[tuple[str, str]] = []

    def handle_starttag(self, tag, attrs):
        if tag == "th":
            self._in_th = True
        elif tag == "td" and self._pending_label is not None:
            self._in_td = True

    def handle_endtag(self, tag):
        if tag == "th":
            self._in_th = False
        elif tag == "td":
            self._in_td = False

    def handle_data(self, data):
        if self._in_th and data.strip():
            self._pending_label = data.strip()
        elif self._in_td and self._pending_label is not None and data.strip():
            self.pairs.append(
                (self._pending_label, data.replace("\xa0", " ").strip())
            )
            self._pending_label = None

    @classmethod
    def extract(cls, html: str) -> list[tuple[str, str]]:
        if not html:
            return []
        p = cls()
        try:
            p.feed(html)
        except Exception:
            return []  # null-on-failure contract (crs_ui_bot.py:226-228)
        return p.pairs


def make_extract_fields_udtf():
    """A REAL Python UDTF (SURVEY §2.8's UDTF row): page → one row per
    extracted (field, value) pair, used with LATERAL so each input row
    fans out to a variable number of output rows. Built lazily so module
    import never requires an active Spark runtime."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="field string, value string")
    class ExtractFieldsUDTF:
        def eval(self, html: str):
            for field, value in _AllPairs.extract(html):
                yield field, value

    return ExtractFieldsUDTF
