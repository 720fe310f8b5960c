"""rag_response assembly: context DataFrames → the reference's JSON block
format → system prompt, stopping at the LLM boundary.

Reference:
  * row shapes — operate.py:1313-1369 (_get_node_data build-prompt section):
      entities:  {id, entity, type, description, rank, created_at, file_path}
      relations: {id, entity1, entity2, description, keywords, weight, rank,
                  created_at, file_path}
      chunks:    {id, content, file_path}
    with defaults "UNKNOWN" (type/description/created_at) and
    "unknown_source" (file_path) when missing.
  * context block — operate.py:908-930: three fenced JSON blocks under
    -----Entities(KG)----- / -----Relationships(KG)----- /
    -----Document Chunks(DC)----- headers (4-space continuation indent from
    the reference's f-string, reproduced verbatim).
  * system prompt — prompt.py:241-273 PROMPTS["rag_response"], formatted
    with context_data/response_type/history/user_prompt
    (operate.py:938-950); defaults response_type="Multiple Paragraphs"
    (base.py:81), user_prompt="n/a" (prompt.py:58).

The render step collects to the driver by design: context frames are
already top-k'd and token-budget-truncated (Q6), so they are prompt-sized
by construction — never the raw tables.
"""

from __future__ import annotations

import json
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# prompt.py:241-273, verbatim
RAG_RESPONSE_TEMPLATE = """---Role---

You are a helpful assistant responding to user query about Knowledge Graph and Document Chunks provided in JSON format below.


---Goal---

Generate a concise response based on Knowledge Base and follow Response Rules, considering both the conversation history and the current query. Summarize all information in the provided Knowledge Base, and incorporating general knowledge relevant to the Knowledge Base. Do not include information not provided by Knowledge Base.

When handling relationships with timestamps:
1. Each relationship has a "created_at" timestamp indicating when we acquired this knowledge
2. When encountering conflicting relationships, consider both the semantic content and the timestamp
3. Don't automatically prefer the most recently created relationships - use judgment based on the context
4. For time-specific queries, prioritize temporal information in the content before considering creation timestamps

---Conversation History---
{history}

---Knowledge Graph and Document Chunks---
{context_data}

---Response Rules---

- Target format and length: {response_type}
- Use markdown formatting with appropriate section headings
- Please respond in the same language as the user's question.
- Ensure the response maintains continuity with the conversation history.
- List up to 5 most important reference sources at the end under "References" section. Clearly indicating whether each source is from Knowledge Graph (KG) or Document Chunks (DC), and include the file path if available, in the following format: [KG/DC] file_path
- If you don't know the answer, just say so.
- Do not make anything up. Do not include information not provided by the Knowledge Base.
- Addtional user prompt: {user_prompt}

Response:"""

# prompt.py:343-375, verbatim — naive mode renders chunks only under its
# own template (operate.py:1804-1811 naive_query)
NAIVE_RAG_RESPONSE_TEMPLATE = """---Role---

You are a helpful assistant responding to user query about Document Chunks provided provided in JSON format below.

---Goal---

Generate a concise response based on Document Chunks and follow Response Rules, considering both the conversation history and the current query. Summarize all information in the provided Document Chunks, and incorporating general knowledge relevant to the Document Chunks. Do not include information not provided by Document Chunks.

When handling content with timestamps:
1. Each piece of content has a "created_at" timestamp indicating when we acquired this knowledge
2. When encountering conflicting information, consider both the content and the timestamp
3. Don't automatically prefer the most recent content - use judgment based on the context
4. For time-specific queries, prioritize temporal information in the content before considering creation timestamps

---Conversation History---
{history}

---Document Chunks(DC)---
{content_data}

---Response Rules---

- Target format and length: {response_type}
- Use markdown formatting with appropriate section headings
- Please respond in the same language as the user's question.
- Ensure the response maintains continuity with the conversation history.
- List up to 5 most important reference sources at the end under "References" section. Clearly indicating each source from Document Chunks(DC), and include the file path if available, in the following format: [DC] file_path
- If you don't know the answer, just say so.
- Do not include information not provided by the Document Chunks.
- Addtional user prompt: {user_prompt}

Response:"""

DEFAULT_USER_PROMPT = "n/a"  # prompt.py:58
DEFAULT_RESPONSE_TYPE = "Multiple Paragraphs"  # base.py:81
DEFAULT_HISTORY_TURNS = 3  # base.py:110


def get_conversation_turns(
    conversation_history: list[dict[str, Any]], num_turns: int
) -> str:
    """utils.py:300-354, faithful port: drop keyword-extraction assistant
    replies, pair messages into (user, assistant) turns, keep the most
    recent num_turns, render as 'user: …\\nassistant: …' lines."""
    if num_turns <= 0:
        return ""
    messages: list[dict[str, Any]] = []
    for msg in conversation_history:
        if msg["role"] == "assistant" and (
            msg["content"].startswith('{ "high_level_keywords"')
            or msg["content"].startswith("{'high_level_keywords'")
        ):
            continue
        messages.append(msg)
    turns: list[list[dict[str, Any]]] = []
    i = 0
    while i < len(messages) - 1:
        msg1, msg2 = messages[i], messages[i + 1]
        if (msg1["role"] == "user" and msg2["role"] == "assistant") or (
            msg1["role"] == "assistant" and msg2["role"] == "user"
        ):
            turns.append([msg2, msg1] if msg1["role"] == "assistant" else [msg1, msg2])
        i += 2
    if len(turns) > num_turns:
        turns = turns[-num_turns:]
    formatted: list[str] = []
    for turn in turns:
        formatted.extend(
            [f"user: {turn[0]['content']}", f"assistant: {turn[1]['content']}"]
        )
    return "\n".join(formatted)


def _get(row: dict, key: str, default: Any) -> Any:
    v = row.get(key)
    return default if v is None else v


def _order_by(df, order_col, fallback: str):
    """Sort by the frame's order column; a combined context's `id` column is
    a NUMERIC STRING (combine_contexts re-ids "1".."n"), so it sorts as an
    int — lexicographic ordering would scramble rows past 9 and break the
    reference's sequential-id invariant."""
    if order_col is None:
        return df.orderBy(fallback)
    if order_col == "id":
        return df.orderBy(F.col("id").cast("int"))
    return df.orderBy(order_col)


def entities_context_rows(entities: DataFrame) -> list[dict]:
    """operate.py:1313-1333: sequential ids, reference key set, defaults."""
    order_col = next(
        (c for c in ("order", "id", "vdb_rank", "rank") if c in entities.columns),
        None,
    )
    df = _order_by(entities, order_col, "entity_id")
    rows = [r.asDict() for r in df.collect()]
    return [
        {
            "id": i + 1,
            "entity": r["entity_id"],
            "type": _get(r, "entity_type", "UNKNOWN"),
            "description": _get(r, "description", "UNKNOWN"),
            "rank": _get(r, "rank", 0),
            "created_at": "UNKNOWN",  # excluded from parity (SURVEY §7.2)
            "file_path": _get(r, "file_path", "unknown_source"),
        }
        for i, r in enumerate(rows)
    ]


def relations_context_rows(relations: DataFrame) -> list[dict]:
    """operate.py:1335-1357."""
    order_col = next(
        (c for c in ("order", "id", "vdb_rank") if c in relations.columns), None
    )
    df = _order_by(relations, order_col, "src_id")
    rows = [r.asDict() for r in df.collect()]
    return [
        {
            "id": i + 1,
            "entity1": r["src_id"],
            "entity2": r["tgt_id"],
            "description": _get(r, "description", "UNKNOWN"),
            "keywords": _get(r, "keywords", "UNKNOWN"),
            "weight": _get(r, "weight", 1.0),
            "rank": _get(r, "rank", 0),
            "created_at": "UNKNOWN",
            "file_path": _get(r, "file_path", "unknown_source"),
        }
        for i, r in enumerate(rows)
    ]


def text_units_context_rows(chunks: DataFrame) -> list[dict]:
    """operate.py:1359-1368."""
    order_col = next(
        (c for c in ("id", "vdb_rank", "rank") if c in chunks.columns), None
    )
    df = _order_by(chunks, order_col, "chunk_id")
    rows = [r.asDict() for r in df.collect()]
    return [
        {
            "id": i + 1,
            "content": r["content"],
            "file_path": _get(r, "file_path", "unknown_source"),
        }
        for i, r in enumerate(rows)
    ]


def render_context_data(ctx: dict[str, Any]) -> str:
    """operate.py:905-930: three json.dumps blocks in the exact f-string
    layout (4-space continuation indent included)."""
    entities_str = json.dumps(entities_context_rows(ctx["entities"]), ensure_ascii=False)
    relations_str = json.dumps(relations_context_rows(ctx["relations"]), ensure_ascii=False)
    text_units_str = json.dumps(text_units_context_rows(ctx["chunks"]), ensure_ascii=False)
    return f"""-----Entities(KG)-----

    ```json
    {entities_str}
    ```

    -----Relationships(KG)-----

    ```json
    {relations_str}
    ```

    -----Document Chunks(DC)-----

    ```json
    {text_units_str}
    ```

    """


def render_naive_context_data(ctx: dict[str, Any]) -> str:
    """naive only_need_context form (operate.py:1789-1796): one fenced JSON
    block of chunk rows under a ---Document Chunks--- header, leading
    newline and trailing blank line exactly as the reference's f-string.
    An empty chunk context short-circuits to the fail response BEFORE the
    context return, exactly like naive_query (operate.py:1784-1786)."""
    rows = text_units_context_rows(ctx["chunks"])
    if not rows:
        from aperag_spark.operators.context import FAIL_RESPONSE

        return FAIL_RESPONSE
    text_units_str = json.dumps(rows, ensure_ascii=False)
    return f"""
---Document Chunks---

```json
{text_units_str}
```

"""


def render_rag_prompt(
    query_text: str,
    ctx: dict[str, Any],
    response_type: str = DEFAULT_RESPONSE_TYPE,
    history: str = "",
    user_prompt: str = DEFAULT_USER_PROMPT,
    conversation_history: list[dict[str, Any]] | None = None,
    history_turns: int = DEFAULT_HISTORY_TURNS,
) -> str:
    """Full system-prompt assembly (operate.py:938-950), LLM call excluded.

    bypass contexts return the raw query (lightrag.py:873-884); fail-path
    contexts (empty keywords) return the fail response unchanged; naive
    contexts render chunks only under the naive template
    (operate.py:1784-1811: empty chunk context → fail response). Pass
    conversation_history (list of {role, content}) to have it formatted via
    get_conversation_turns, or a pre-rendered `history` string."""
    pre_rendered = ctx.get("prompt")
    if pre_rendered is not None:
        return pre_rendered
    if conversation_history:
        history = get_conversation_turns(conversation_history, history_turns)
    if ctx.get("mode") == "naive":
        rows = text_units_context_rows(ctx["chunks"])
        if not rows:
            from aperag_spark.operators.context import FAIL_RESPONSE

            return FAIL_RESPONSE
        return NAIVE_RAG_RESPONSE_TEMPLATE.format(
            content_data=json.dumps(rows, ensure_ascii=False),
            response_type=response_type,
            history=history,
            user_prompt=user_prompt,
        )
    return RAG_RESPONSE_TEMPLATE.format(
        context_data=render_context_data(ctx),
        response_type=response_type,
        history=history,
        user_prompt=user_prompt,
    )
