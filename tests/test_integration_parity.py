"""End-to-end integration parity vs the reference's golden output.

Replicates the reference integration spider (6 item-loader pipelines,
``tests/integration_test/scrapy_project/item_loaders.py:13-61`` applied to
``dirty_data.html``) as a Spark job over a one-row pages table, asserting
exact equality with every record of
``tests/integration_test/cleaned_data.json``.

Field extraction uses (?s) regex over the html (XPath-equivalent for these
id-addressed <p> nodes); datetimes serialize with the scrapy feed-export
convention (``%Y-%m-%d %H:%M:%S``).
"""

import json
import re
from datetime import datetime

import pytest
import pytz

from pyspark.sql import functions as F

from scrapy_processors_spark import (
    DateTime,
    MapCompose,
    NormalizeNumericString,
    PriceParser,
    SelectJmes,
    TakeFirstTruthy,
    clean_string,
)

DIRTY_HTML = open("/root/reference/tests/integration_test/dirty_data.html").read()
GOLDEN = json.load(open("/root/reference/tests/integration_test/cleaned_data.json"))


def xpath_text(html: str, pid: str) -> str:
    m = re.search(r'<p id="%s">(.*?)</p>' % re.escape(pid), html, re.S)
    return m.group(1)


select_jmes = MapCompose(json.loads, SelectJmes("foo"))
json2_pipeline = select_jmes.replace(1, SelectJmes("name")) + clean_string + str.title
text_pipeline = clean_string + str.capitalize


def _fmt(v):
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    return v


def test_integration_parity_python():
    out = []
    tf = TakeFirstTruthy()

    dt = DateTime(input_tz=pytz.utc)
    for pid in ("iso-8601-datetime-1", "iso-8601-datetime-2"):
        vals = MapCompose(dt).run_python(xpath_text(DIRTY_HTML, pid))
        out.append({"date": _fmt(tf.run_python(vals))})
    dt_ctx = DateTime(input_tz=pytz.utc, format="%A, %B %d, %Y %I%p")
    vals = MapCompose(dt_ctx).run_python(xpath_text(DIRTY_HTML, "datetime-context"))
    out.append({"date": _fmt(tf.run_python(vals))})

    nns = MapCompose(NormalizeNumericString())
    out.append({"number": tf.run_python(nns.run_python(xpath_text(DIRTY_HTML, "num-1")))})
    nns2 = MapCompose(NormalizeNumericString(decimal_places=2))
    out.append({"number": tf.run_python(nns2.run_python(xpath_text(DIRTY_HTML, "num-2")))})

    price = tf.run_python(MapCompose(PriceParser()).run_python(xpath_text(DIRTY_HTML, "price")))
    out.append({"price": {"amount": str(price.amount), "currency": price.currency,
                          "amount_text": price.amount_text}})

    out.append({"text": tf.run_python(text_pipeline.run_python(xpath_text(DIRTY_HTML, "dirty-string")))})

    out.append({"json": tf.run_python(select_jmes.run_python(xpath_text(DIRTY_HTML, "json-1")))})
    out.append({"json": tf.run_python(json2_pipeline.run_python(xpath_text(DIRTY_HTML, "json-1")))})

    assert out == GOLDEN


def test_integration_parity_spark(spark):
    pages = spark.createDataFrame([("file://dirty_data.html", DIRTY_HTML)], "url string, html string")

    def extract(pid):
        return F.regexp_extract("html", r'(?s)<p id="%s">(.*?)</p>' % pid, 1)

    dt = DateTime(input_tz="UTC")
    dt_ctx = DateTime(input_tz="UTC", format="%A, %B %d, %Y %I%p")
    price = PriceParser()(extract("price"))
    row = pages.select(
        F.date_format(dt(extract("iso-8601-datetime-1")), "yyyy-MM-dd HH:mm:ss").alias("date1"),
        F.date_format(dt(extract("iso-8601-datetime-2")), "yyyy-MM-dd HH:mm:ss").alias("date2"),
        F.date_format(dt_ctx(extract("datetime-context")), "yyyy-MM-dd HH:mm:ss").alias("date3"),
        NormalizeNumericString()(extract("num-1")).alias("num1"),
        NormalizeNumericString(decimal_places=2)(extract("num-2")).alias("num2"),
        price.getField("amount").alias("price_amount"),
        price.getField("currency").alias("price_currency"),
        price.getField("amount_text").alias("price_amount_text"),
        text_pipeline.apply_scalar(extract("dirty-string")).alias("text"),
        select_jmes.apply_scalar(extract("json-1")).alias("json1"),
        json2_pipeline.apply_scalar(extract("json-1")).alias("json2"),
    ).collect()[0]

    assert row["date1"] == GOLDEN[0]["date"]
    assert row["date2"] == GOLDEN[1]["date"]
    assert row["date3"] == GOLDEN[2]["date"]
    assert row["num1"] == GOLDEN[3]["number"]
    assert row["num2"] == GOLDEN[4]["number"]
    assert row["price_amount"] == GOLDEN[5]["price"]["amount"]
    assert row["price_currency"] == GOLDEN[5]["price"]["currency"]
    assert row["price_amount_text"] == GOLDEN[5]["price"]["amount_text"]
    assert row["text"] == GOLDEN[6]["text"]
    assert row["json1"] == GOLDEN[7]["json"]
    assert row["json2"] == GOLDEN[8]["json"]
