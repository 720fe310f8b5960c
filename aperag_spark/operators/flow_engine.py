"""Generic flow DAG engine — the executor for arbitrary user-defined flows,
the last reference subsystem in scope with no counterpart until now.

Reference: aperag/flow/engine.py:71-260 (FlowEngine — topological sort with
cycle detection :163-203, level-by-level parallel node groups :204-236,
per-node start/end/error events :32-61,116-160, `{{ nodes.<id>.output.* }}`
variable resolution :238-307) and aperag/flow/base/models.py:25-87
(NodeInstance / Edge / FlowInstance with validate()). The node runners it
schedules are the Spark restatements: operators/flow.merge_docs /
rerank_docs (Q11/Q12) and retrieval legs over KGEngine tables (vector /
fulltext / graph — runners/vector_search.py, fulltext_search.py,
graph_search.py shapes).

Execution-model notes (where Spark changes the answer):
  * The reference gathers a parallel group with asyncio (each node awaits a
    remote service). Here nodes BUILD lazy DataFrames — cheap driver work —
    and any materialization is a Spark job, so a parallel group runs its
    runners on a driver thread pool (Spark job submission is thread-safe;
    concurrent jobs share the executor pool — the cluster, not the DAG
    engine, is the parallelism budget).
  * Variable resolution implements the reference's exact-`{{ ... }}` path
    branch (engine.py:295-299 — the branch that preserves the referenced
    object rather than stringifying). General jinja templating of other
    strings is NOT reproduced (no jinja2 dependency, and stringifying a
    DataFrame is never wanted); such strings pass through verbatim.
  * Events carry a process-monotone `seq` (the reference's wall-clock
    timestamp is kept too) so tests can assert ordering without clock
    assumptions.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any


class CycleError(Exception):
    """Flow contains cycles (flow/base/exceptions.py)."""


class ValidationError(Exception):
    """Bad variable reference or node input (flow/base/exceptions.py)."""


@dataclass
class NodeInstance:
    """flow/base/models.py:25-34."""

    id: str
    type: str
    input_values: dict = field(default_factory=dict)
    title: str | None = None


@dataclass
class Edge:
    """flow/base/models.py:37-42."""

    source: str
    target: str


@dataclass
class FlowInstance:
    """flow/base/models.py:45-87: a flow definition with nodes and edges;
    validate() runs the topological sort purely for cycle detection."""

    name: str
    title: str
    nodes: dict[str, NodeInstance]
    edges: list[Edge]

    def validate(self) -> None:
        topological_sort(self)


def topological_sort(flow: FlowInstance) -> list[str]:
    """Kahn's algorithm, exactly the reference's (engine.py:163-203 /
    models.py:56-87): raises CycleError when no zero-in-degree start exists
    or when the sort doesn't consume every node."""
    in_degree = {node_id: 0 for node_id in flow.nodes}
    for edge in flow.edges:
        if edge.source not in flow.nodes or edge.target not in flow.nodes:
            raise ValidationError(f"Edge references unknown node: {edge}")
        in_degree[edge.target] += 1
    queue = deque(n for n, d in in_degree.items() if d == 0)
    if len(queue) == 0 and flow.nodes:
        raise CycleError("Flow contains cycles")
    sorted_nodes: list[str] = []
    while queue:
        node_id = queue.popleft()
        sorted_nodes.append(node_id)
        for edge in flow.edges:
            if edge.source == node_id:
                in_degree[edge.target] -= 1
                if in_degree[edge.target] == 0:
                    queue.append(edge.target)
    if len(sorted_nodes) != len(flow.nodes):
        raise CycleError("Flow contains cycles")
    return sorted_nodes


def find_parallel_groups(flow: FlowInstance, sorted_nodes: list[str]) -> list[set[str]]:
    """Level-by-level grouping, exactly the reference's (engine.py:204-236):
    each group is every unprocessed node whose in-degree has reached 0;
    group members have no edges among themselves, so they run in parallel."""
    in_degree = {node_id: 0 for node_id in flow.nodes}
    for edge in flow.edges:
        in_degree[edge.target] += 1
    processed: set[str] = set()
    groups: list[set[str]] = []
    while len(processed) < len(sorted_nodes):
        current = {
            n for n in sorted_nodes if in_degree[n] == 0 and n not in processed
        }
        if not current:
            break
        groups.append(current)
        for node_id in current:
            processed.add(node_id)
            for edge in flow.edges:
                if edge.source == node_id:
                    in_degree[edge.target] -= 1
    return groups


class FlowEventType:
    """engine.py:53-61."""

    NODE_START = "node_start"
    NODE_END = "node_end"
    NODE_ERROR = "node_error"
    FLOW_START = "flow_start"
    FLOW_END = "flow_end"
    FLOW_ERROR = "flow_error"


NODE_RUNNER_REGISTRY: dict[str, Callable] = {}


def register_node_runner(node_type: str):
    """flow/base/models.py:130-143: runner registration by node type. A
    runner is `fn(engine, node, inputs) -> dict outputs` (the reference's
    async run(ui, si) collapses to a plain call — see module docstring)."""

    def deco(fn):
        NODE_RUNNER_REGISTRY[node_type] = fn
        return fn

    return deco


class FlowEngine:
    """One engine instance per execution (the reference documents the same
    single-use contract, engine.py:63-70)."""

    def __init__(self, services: dict[str, Any] | None = None, runners: dict | None = None):
        self.services = services or {}
        self.runners = {**NODE_RUNNER_REGISTRY, **(runners or {})}
        self.outputs: dict[str, dict] = {}
        self.system_input: dict[str, Any] = {}
        self.events: list[dict] = []
        self.groups: list[set[str]] = []
        self._seq = 0
        self._lock = threading.Lock()
        self.execution_id: str | None = None

    # -- events ------------------------------------------------------------
    def _emit(self, event_type: str, node_id: str | None, data: dict | None = None):
        with self._lock:
            self._seq += 1
            self.events.append(
                {
                    "event_type": event_type,
                    "node_id": node_id,
                    "execution_id": self.execution_id,
                    "seq": self._seq,
                    "timestamp": time.time(),
                    "data": data or {},
                }
            )

    # -- variable resolution (engine.py:238-307 subset) --------------------
    def _resolve_variable(self, expr: str):
        parts = expr.strip().split(".")
        if parts and parts[0] == "nodes":
            if len(parts) < 4 or parts[2] != "output":
                raise ValidationError(f"Invalid variable reference: {{{{ {expr} }}}}")
            node_id, field_path = parts[1], parts[3:]
            value: Any = self.outputs.get(node_id, {})
            for key in field_path:
                if isinstance(value, dict) and key in value:
                    value = value[key]
                elif hasattr(value, key):
                    value = getattr(value, key)
                else:
                    raise ValidationError(f"Cannot resolve variable: {{{{ {expr} }}}}")
            return value
        raise ValidationError(f"Unknown variable scope: {{{{ {expr} }}}}")

    def resolve_expression(self, value):
        if isinstance(value, dict):
            return {k: self.resolve_expression(v) for k, v in value.items()}
        if isinstance(value, list):
            return [self.resolve_expression(v) for v in value]
        if not isinstance(value, str):
            return value
        s = value.strip()
        if s.startswith("{{") and s.endswith("}}"):
            return self._resolve_variable(s[2:-2])
        return value

    # -- execution ---------------------------------------------------------
    def _execute_node(self, flow: FlowInstance, node_id: str):
        node = flow.nodes[node_id]
        self._emit(FlowEventType.NODE_START, node_id, {"type": node.type})
        try:
            runner = self.runners.get(node.type)
            if runner is None:
                raise ValidationError(f"No runner registered for type '{node.type}'")
            inputs = self.resolve_expression(node.input_values)
            out = runner(self, node, inputs) or {}
            with self._lock:
                self.outputs[node_id] = out
            self._emit(FlowEventType.NODE_END, node_id, {"type": node.type})
        except Exception as e:
            self._emit(FlowEventType.NODE_ERROR, node_id, {"error": str(e)})
            raise

    def execute_flow(
        self, flow: FlowInstance, system_input: dict[str, Any] | None = None
    ) -> dict[str, dict]:
        import uuid

        self.execution_id = str(uuid.uuid4())[:8]
        self.system_input = system_input or {}
        self._emit(FlowEventType.FLOW_START, None, {"flow_name": flow.name})
        try:
            sorted_nodes = topological_sort(flow)
            self.groups = find_parallel_groups(flow, sorted_nodes)
            for group in self.groups:
                if len(group) == 1:
                    self._execute_node(flow, next(iter(group)))
                else:
                    # asyncio.gather analog (engine.py:243-253): driver
                    # threads submit Spark jobs concurrently
                    with ThreadPoolExecutor(max_workers=len(group)) as pool:
                        futures = [
                            pool.submit(self._execute_node, flow, n) for n in group
                        ]
                        for f in futures:
                            f.result()
            self._emit(FlowEventType.FLOW_END, None, {"flow_name": flow.name})
            return self.outputs
        except Exception as e:
            self._emit(
                FlowEventType.FLOW_ERROR, None, {"flow_name": flow.name, "error": str(e)}
            )
            raise


# ---------------------------------------------------------------------------
# Built-in runners: the reference's canonical RAG flow node types
# (aperag/flow/runners/*.py), over KGEngine tables. Each leg outputs
# {"docs": DataFrame(text, score, rank)} — the DocumentWithScore shape the
# merge node consumes (runners/merge.py:46-69).
# ---------------------------------------------------------------------------


@register_node_runner("start")
def _run_start(engine: FlowEngine, node: NodeInstance, inputs: dict) -> dict:
    """runners/start.py: surface the system input to downstream nodes."""
    return {"query": engine.system_input.get("query", "")}


@register_node_runner("vector_search")
def _run_vector_search(engine: FlowEngine, node: NodeInstance, inputs: dict) -> dict:
    """runners/vector_search.py shape: top-k cosine over the chunk VDB with
    a similarity floor."""
    import pyspark.sql.functions as F

    from aperag_spark.operators.vectors import cosine_col, deterministic_embedding
    from aperag_spark.operators.windows import rank_bounded

    kg = engine.services["kg"]
    top_k = int(inputs.get("top_k", 5))
    threshold = float(inputs.get("similarity_threshold", 0.2))
    q = F.array(*[F.lit(x) for x in deterministic_embedding(inputs["query"])])
    vdb = kg._vdb("chunk")
    scored = (
        vdb.withColumn("score", F.round(cosine_col(F.col("embedding"), q), 6))
        .where(F.col("score") >= threshold)
        .select(F.col("content").alias("text"), "score")
    )
    docs = rank_bounded(scored, [("score", "desc"), ("text", "asc")], k=top_k)
    return {"docs": docs}


@register_node_runner("fulltext_search")
def _run_fulltext_search(engine: FlowEngine, node: NodeInstance, inputs: dict) -> dict:
    """runners/fulltext_search.py shape: keyword-extract the query, BM25
    over the chunk index, join text back by chunk id."""
    import pyspark.sql.functions as F

    from aperag_spark.operators.context import extract_query_keywords

    kg = engine.services["kg"]
    top_k = int(inputs.get("top_k", 5))
    keywords = extract_query_keywords(inputs["query"])
    hits = kg.fulltext_search(keywords, topk=top_k)
    docs = (
        hits.join(
            kg.chunks.select(F.col("chunk_id").alias("id"), "content"), "id"
        )
        .select(F.col("content").alias("text"), "score", "rank")
        .orderBy("rank")
    )
    return {"docs": docs}


@register_node_runner("graph_search")
def _run_graph_search(engine: FlowEngine, node: NodeInstance, inputs: dict) -> dict:
    """runners/graph_search.py shape: KG context chunks (local mode — seed
    entities by vdb hit, provenance chunks in hit order), rank-scored."""
    import pyspark.sql.functions as F

    from aperag_spark.operators.windows import rank_bounded

    kg = engine.services["kg"]
    top_k = int(inputs.get("top_k", 5))
    ctx = kg.query(inputs["query"], mode="local", top_k=top_k)
    chunks = ctx["chunks"].select(
        F.col("content").alias("text"), F.col("vdb_rank").cast("double").alias("vr")
    )
    docs = rank_bounded(chunks, [("vr", "asc"), ("text", "asc")], k=top_k)
    return {
        "docs": docs.select(
            "text", F.round(1.0 / F.col("rank"), 6).alias("score"), "rank"
        )
    }


@register_node_runner("merge")
def _run_merge(engine: FlowEngine, node: NodeInstance, inputs: dict) -> dict:
    """runners/merge.py:46-69 via operators/flow.merge_docs."""
    from aperag_spark.operators.flow import merge_docs

    merged = merge_docs(
        inputs.get("vector_docs"),
        inputs.get("fulltext_docs"),
        inputs.get("graph_docs"),
        deduplicate=bool(inputs.get("deduplicate", True)),
        merge_strategy=inputs.get("merge_strategy", "union"),
    )
    return {"docs": merged}


@register_node_runner("rerank")
def _run_rerank(engine: FlowEngine, node: NodeInstance, inputs: dict) -> dict:
    """runners/rerank.py:52-120 via operators/flow.rerank_docs."""
    from aperag_spark.operators.flow import rerank_docs

    return {"docs": rerank_docs(inputs["query"], inputs["docs"])}


# runners/llm.py:35-41,131-160: char-per-token estimate, output reservation,
# fallback context budget when no model config is available
TOKEN_TO_CHAR_RATIO = 1.5
DEFAULT_OUTPUT_TOKENS = 1000
FALLBACK_MAX_CONTEXT_LENGTH = 50_000


@register_node_runner("llm")
def _run_llm(engine: FlowEngine, node: NodeInstance, inputs: dict) -> dict:
    """runners/llm.py:200-247 — the generation node, reproduced up to the
    LLM boundary (the completion call is the declared external service,
    same design as KGEngine.query_prompt's only_need_prompt form; a
    deterministic stub response keeps the node composable and testable):

      * greedy doc packing under the char budget: a doc joins the context
        only while len(template)+len(query)+len(context)+len(doc) fits
        max_input_chars (llm.py:214-221), each packed doc recorded as a
        reference (llm.py:222);
      * prompt = template.format(query=..., context=...) (llm.py:223),
        over-budget prompts refused (llm.py:224-228);
      * max_input_chars = max_input_tokens × 1.5 with the reference's
        fallback budget when no model config exists (llm.py:146-160).

    The docs frame is an upstream top-k leg/merge/rerank output — bounded,
    so the collect here is k rows, never a table scan."""
    import hashlib

    query = inputs.get("query", engine.system_input.get("query", ""))
    template = inputs.get("prompt_template", "{context}\n{query}")
    max_input_tokens = int(
        inputs.get(
            "max_input_tokens", FALLBACK_MAX_CONTEXT_LENGTH // int(TOKEN_TO_CHAR_RATIO)
        )
    )
    max_input_chars = max_input_tokens * TOKEN_TO_CHAR_RATIO
    docs_df = inputs.get("docs")
    context, references = "", []
    if docs_df is not None:
        rows = (
            docs_df.orderBy("rank").collect()
            if "rank" in docs_df.columns
            else docs_df.collect()
        )
        for r in rows:
            text = r["text"]
            if len(template) + len(query) + len(context) + len(text) > max_input_chars:
                break
            context += text
            references.append({"text": text, "score": float(r["score"])})
    prompt = template.format(query=query, context=context)
    if len(prompt) > max_input_chars:
        raise ValidationError(
            f"Prompt requires {len(prompt)} characters, which exceeds the "
            f"calculated input limit of {max_input_chars} characters"
        )
    response = "STUB_RESPONSE:" + hashlib.md5(prompt.encode()).hexdigest()[:16]
    return {"text": response, "prompt": prompt, "references": references}


def canonical_rag_flow() -> FlowInstance:
    """The reference's canonical RAG flow (aperag/flow/examples/
    rag_flow.yaml): start → three parallel retrieval legs → merge → rerank,
    every downstream input wired through `{{ nodes.<id>.output.* }}`
    references exactly as the YAML does."""
    qref = "{{ nodes.start.output.query }}"
    nodes = {
        "start": NodeInstance("start", "start"),
        "vector_search": NodeInstance(
            "vector_search",
            "vector_search",
            {"top_k": 5, "similarity_threshold": 0.2, "query": qref},
        ),
        "fulltext_search": NodeInstance(
            "fulltext_search", "fulltext_search", {"top_k": 5, "query": qref}
        ),
        "graph_search": NodeInstance(
            "graph_search", "graph_search", {"top_k": 5, "query": qref}
        ),
        "merge": NodeInstance(
            "merge",
            "merge",
            {
                "merge_strategy": "union",
                "deduplicate": True,
                "vector_docs": "{{ nodes.vector_search.output.docs }}",
                "fulltext_docs": "{{ nodes.fulltext_search.output.docs }}",
                "graph_docs": "{{ nodes.graph_search.output.docs }}",
            },
        ),
        "rerank": NodeInstance(
            "rerank",
            "rerank",
            {"query": qref, "docs": "{{ nodes.merge.output.docs }}"},
        ),
        "llm": NodeInstance(
            "llm",
            "llm",
            {
                "prompt_template": "{context}\n{query}",
                "query": qref,
                "docs": "{{ nodes.rerank.output.docs }}",
            },
        ),
    }
    edges = [
        Edge("start", "vector_search"),
        Edge("start", "fulltext_search"),
        Edge("start", "graph_search"),
        Edge("vector_search", "merge"),
        Edge("fulltext_search", "merge"),
        Edge("graph_search", "merge"),
        Edge("merge", "rerank"),
        Edge("rerank", "llm"),
    ]
    return FlowInstance("rag_flow", "RAG Knowledge Base Flow", nodes, edges)
