"""Pipeline token/cost estimation — the reference's cost-estimation surface
(evaluation/costs/cost_estimation.py) re-expressed as Spark operators.

Reference semantics reproduced:
  * prompt assembly — the LangChain wrapper "# Context: ...\n\n# Question:
    ...\n\nAnswer: " (:199, :251-263) around the scenario system queries:
    scenario F step 1 "Observation Date: {d}\n\n{prompt}\n\nParagraph: {lead}"
    (:487-492), step 2 "Observation Time: {d}\n\n{prompt}\n\n{examples}\n\n
    Atomic Facts:\n{facts}" (:533-541), scenario L "...\n\nParagraph: {lead}"
    (:768-774). Prompt/example TEXTS and Pydantic-schema token counts are
    PARAMETERS (they are model configuration, like the LLM itself) — the
    parity tests pass the reference's own constants through.
  * output reconstruction — the exact JSON the LLM emits: facts as
    {"atomic_fact":[...]} (:265-287), quintuples as {"relationships":[{
    startNode/endNode (generic "Entity" label), name, t_start, t_end}...]}
    (:287-339) — built with `to_json` over typed structs (Jackson's compact
    encoding is byte-identical to json.dumps(..., separators=(',',':'),
    ensure_ascii=False) on this value space).
  * embedding token counting — per-mention (NOT distinct) entity labels +
    names + relation names (:382-446).
  * cost arithmetic — per-model input/output pricing with optional batch
    rates, cost per article (:830-897). Pricing tables are parameters.

Tokenizer: the reference uses tiktoken (cl100k_base), which is not in this
container. The operators take a regex token pattern (default TOKEN_PATTERN, a
word/punctuation splitter with an explicit ASCII-whitespace class so Python
re, Java regex, and DuckDB RE2 agree) — the SAME pattern drives the pytest
parity harness's tiktoken shim, so the assembly/arithmetic parity is exact by
construction and a real tiktoken can be swapped in by callers that have it.

Scale shape: everything is whole-stage-codegen Catalyst (concat + to_json +
regexp_extract_all + sums) — no Python in the plan, one map-side partial agg
for totals. At 100 TB this is a single scan.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word-or-symbol tokens; whitespace = explicit ASCII control/space class so
# Python re (unicode \s) and RE2/Java (ascii \s) cannot disagree.
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^\x00-\x20A-Za-z0-9]"

_TOKEN_RE = re.compile(TOKEN_PATTERN)

LANGCHAIN_WRAPPER = ("# Context: ", "\n\n# Question: ", "\n\nAnswer: ")


def count_tokens_py(text, pattern: re.Pattern | None = None) -> int:
    """Python twin of `token_count` — also the body of the tiktoken shim the
    parity tests inject into the reference script. Mirrors the reference
    count_tokens pre-checks (:208-216): falsy -> 0, list/dict -> compact
    JSON first."""
    if text is None or text == "" or text == [] or text == {}:
        return 0
    if isinstance(text, (list, dict)):
        text = json.dumps(text, ensure_ascii=False)
    return len((pattern or _TOKEN_RE).findall(str(text)))


def token_count(col: Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Catalyst token counter (codegen; no Python worker)."""
    return F.coalesce(
        F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))), F.lit(0)
    )


def wrap_prompt(context: Column, system_query: Column) -> Column:
    """LangChain wrapper parity (:251-263)."""
    a, b, c = LANGCHAIN_WRAPPER
    return F.concat(F.lit(a), context, F.lit(b), system_query, F.lit(c))


def facts_json(facts: Column) -> Column:
    """{"atomic_fact":[...]} — format_atomic_facts_as_json (:265-287)."""
    safe = F.coalesce(facts, F.array().cast("array<string>"))
    return F.to_json(F.struct(safe.alias("atomic_fact")))


def _safe_quints(quints: Column) -> Column:
    return F.coalesce(
        quints,
        F.array().cast(
            "array<struct<head:string,rel:string,tail:string,"
            "t_start:array<string>,t_end:array<string>>>"
        ),
    )


def relationships_json(quints: Column) -> Column:
    """{"relationships":[...]} with generic Entity endpoint labels —
    format_relationships_as_json (:287-339). Input is the typed quintuple
    struct array (head, rel, tail, t_start, t_end)."""
    q = _safe_quints(quints)
    empty = F.array().cast("array<string>")
    rels = F.transform(
        q,
        lambda x: F.struct(
            F.struct(
                F.lit("Entity").alias("label"),
                F.coalesce(x["head"], F.lit("")).alias("name"),
            ).alias("startNode"),
            F.struct(
                F.lit("Entity").alias("label"),
                F.coalesce(x["tail"], F.lit("")).alias("name"),
            ).alias("endNode"),
            F.coalesce(x["rel"], F.lit("")).alias("name"),
            F.coalesce(x["t_start"], empty).alias("t_start"),
            F.coalesce(x["t_end"], empty).alias("t_end"),
        ),
    )
    return F.to_json(F.struct(rels.alias("relationships")))


def embedding_tokens(quints: Column, pattern: str = TOKEN_PATTERN) -> Column:
    """Per-mention embedding token count (:382-446): every head name, tail
    name, relation name, plus the generic "Entity" label per endpoint.
    Sum-of-counts == count-of-space-join because no token spans whitespace,
    so one codegen regexp pass covers the whole array (no per-element HOF
    counting, no Python)."""
    q = _safe_quints(quints)
    names = F.concat(
        F.transform(q, lambda x: F.coalesce(x["head"], F.lit(""))),
        F.transform(q, lambda x: F.coalesce(x["tail"], F.lit(""))),
        F.transform(q, lambda x: F.coalesce(x["rel"], F.lit(""))),
    )
    return token_count(F.array_join(names, " "), pattern) + F.lit(2) * F.size(
        q
    ) * token_count(F.lit("Entity"), pattern)


def scenario_factoid_tokens(
    df: DataFrame,
    facts_prompt: str,
    quint_prompt: str,
    quint_examples: str,
    facts_schema_tokens: int,
    rel_schema_tokens: int,
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Scenario F (:448-610): lead -> atomic facts -> quintuples. Input
    df(doc_id, lead string, obs_date string, facts array<string>,
    quintuples array<struct<head,rel,tail,t_start,t_end>>) -> per-doc token
    columns."""
    lead = F.coalesce(F.col("lead"), F.lit(""))
    date = F.coalesce(F.col("obs_date"), F.lit(""))
    sq1 = F.concat(
        F.lit("Observation Date: "), date, F.lit(f"\n\n{facts_prompt}\n\nParagraph: "),
        lead,
    )
    in1 = token_count(wrap_prompt(lead, sq1), pattern) + F.lit(
        int(facts_schema_tokens)
    )
    out1 = token_count(facts_json(F.col("facts")), pattern)

    # step 2 context: non-empty facts joined by newline (:351-364)
    facts_text = F.array_join(
        F.filter(
            F.coalesce(F.col("facts"), F.array().cast("array<string>")),
            lambda s: s.isNotNull() & (s != ""),
        ),
        "\n",
    )
    sq2 = F.concat(
        F.lit("Observation Time: "), date,
        F.lit(f"\n\n{quint_prompt}\n\n{quint_examples}\n\nAtomic Facts:\n"),
        facts_text,
    )
    in2 = token_count(wrap_prompt(facts_text, sq2), pattern) + F.lit(
        int(rel_schema_tokens)
    )
    out2 = token_count(relationships_json(F.col("quintuples")), pattern)
    return df.select(
        "doc_id",
        in1.alias("step1_input_tokens"),
        out1.alias("step1_output_tokens"),
        in2.alias("step2_input_tokens"),
        out2.alias("step2_output_tokens"),
        embedding_tokens(F.col("quintuples"), pattern).alias("embedding_tokens"),
    )


def scenario_direct_tokens(
    df: DataFrame,
    quint_prompt: str,
    quint_examples: str,
    rel_schema_tokens: int,
    pattern: str = TOKEN_PATTERN,
) -> DataFrame:
    """Scenario L (:717-828): lead -> quintuples directly."""
    lead = F.coalesce(F.col("lead"), F.lit(""))
    date = F.coalesce(F.col("obs_date"), F.lit(""))
    sq = F.concat(
        F.lit("Observation Time: "), date,
        F.lit(f"\n\n{quint_prompt}\n\n{quint_examples}\n\nParagraph: "),
        lead,
    )
    in1 = token_count(wrap_prompt(lead, sq), pattern) + F.lit(
        int(rel_schema_tokens)
    )
    out1 = token_count(relationships_json(F.col("quintuples")), pattern)
    return df.select(
        "doc_id",
        in1.alias("input_tokens"),
        out1.alias("output_tokens"),
        embedding_tokens(F.col("quintuples"), pattern).alias("embedding_tokens"),
    )


def token_totals(per_doc: DataFrame) -> dict:
    """Sum the per-doc token columns into the reference's scenario stats
    shape (total_input_tokens / total_output_tokens / total_embedding_tokens
    / num_articles)."""
    cols = [c for c in per_doc.columns if c != "doc_id"]
    row = per_doc.agg(
        *[F.sum(c).alias(c) for c in cols], F.count("*").alias("num_articles")
    ).collect()[0]
    d = row.asDict()
    inputs = [c for c in cols if c.endswith("input_tokens")]
    outputs = [c for c in cols if c.endswith("output_tokens")]
    d["total_input_tokens"] = int(sum(d[c] or 0 for c in inputs))
    d["total_output_tokens"] = int(sum(d[c] or 0 for c in outputs))
    d["total_embedding_tokens"] = int(d.get("embedding_tokens") or 0)
    return d


def model_costs(
    token_stats: dict, pricing: dict, use_batch: bool = False
) -> dict:
    """calculate_costs (:830-871): per-model USD from token totals. `pricing`
    maps model id -> {name, input, output, batch_input, batch_output} per 1M
    tokens (the caller's price book; tests pass the reference's)."""
    if not token_stats:
        return {}
    input_tokens = token_stats.get("total_input_tokens", 0)
    output_tokens = token_stats.get("total_output_tokens", 0)
    costs = {}
    for model_id, p in pricing.items():
        if use_batch:
            input_cost = (input_tokens / 1e6) * p["batch_input"]
            output_cost = (output_tokens / 1e6) * p["batch_output"]
        else:
            input_cost = (input_tokens / 1e6) * p["input"]
            output_cost = (output_tokens / 1e6) * p["output"]
        total = input_cost + output_cost
        n = token_stats.get("num_articles", 0)
        costs[model_id] = {
            "model_name": p["name"],
            "input_cost": input_cost,
            "output_cost": output_cost,
            "total_cost": total,
            "cost_per_article": total / token_stats.get("num_articles", 1)
            if n > 0
            else 0,
        }
    return costs


def embedding_costs(embedding_tokens_total: int, pricing: dict) -> dict:
    """calculate_embeddings_costs (:872-897)."""
    if embedding_tokens_total <= 0:
        return {}
    return {
        model_id: {
            "model_name": p["name"],
            "total_cost": (embedding_tokens_total / 1e6) * p["cost_per_million"],
            "tokens": embedding_tokens_total,
        }
        for model_id, p in pricing.items()
    }
