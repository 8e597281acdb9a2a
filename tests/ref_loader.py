"""Load the reference matcher (/root/reference, read-only) as a differential
oracle — without importing its package __init__ (which needs langchain) and
without sklearn (shimmed with a 10-line numpy cosine).

This gives tests the REAL reference semantics (Entity.process, Relationship
combine, GraphMatcher pairwise matching) to compare our Spark engine against;
no reference code is copied into this repo.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference/itext2kg"


def _shim_sklearn():
    if "sklearn.metrics.pairwise" in sys.modules:
        return

    def cosine_similarity(A, B=None):
        if B is None:
            B = A
        A = np.asarray(A, dtype=np.float64)
        B = np.asarray(B, dtype=np.float64)
        An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        return An @ Bn.T

    sk = types.ModuleType("sklearn")
    met = types.ModuleType("sklearn.metrics")
    pw = types.ModuleType("sklearn.metrics.pairwise")
    pw.cosine_similarity = cosine_similarity
    sk.metrics = met
    met.pairwise = pw
    sys.modules["sklearn"] = sk
    sys.modules["sklearn.metrics"] = met
    sys.modules["sklearn.metrics.pairwise"] = pw


def _load(dotted: str, path: str):
    if dotted in sys.modules:
        return sys.modules[dotted]
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns a namespace with Entity, Relationship, RelationshipProperties,
    KnowledgeGraph, GraphMatcher from the reference, or None if unloadable."""
    try:
        _shim_sklearn()
        for pkg in (
            "itext2kg",
            "itext2kg.atom",
            "itext2kg.atom.models",
            "itext2kg.atom.graph_matching",
        ):
            if pkg not in sys.modules:
                m = types.ModuleType(pkg)
                m.__path__ = []
                sys.modules[pkg] = m

        ent = _load("itext2kg.atom.models.entity", f"{REF}/atom/models/entity.py")
        rel = _load(
            "itext2kg.atom.models.relationship", f"{REF}/atom/models/relationship.py"
        )
        kg = _load(
            "itext2kg.atom.models.knowledge_graph",
            f"{REF}/atom/models/knowledge_graph.py",
        )
        models = sys.modules["itext2kg.atom.models"]
        models.Entity = ent.Entity
        models.Relationship = rel.Relationship
        models.RelationshipProperties = rel.RelationshipProperties
        models.KnowledgeGraph = kg.KnowledgeGraph

        mi = _load(
            "itext2kg.atom.graph_matching.matcher_interface",
            f"{REF}/atom/graph_matching/matcher_interface.py",
        )
        matcher = _load(
            "itext2kg.atom.graph_matching.matcher",
            f"{REF}/atom/graph_matching/matcher.py",
        )
        ns = types.SimpleNamespace(
            Entity=ent.Entity,
            Relationship=rel.Relationship,
            RelationshipProperties=rel.RelationshipProperties,
            KnowledgeGraph=kg.KnowledgeGraph,
            GraphMatcher=matcher.GraphMatcher,
        )
        return ns
    except Exception:  # pragma: no cover - reference tree absent/changed
        return None


_REF = None


def get_reference():
    global _REF
    if _REF is None:
        _REF = load_reference()
    return _REF


def load_reference_merge_eval():
    """Load the published merge-eval module (ER/RR precision formulas,
    evaluation/merge/evaluate_itext2kg_merge.py) with its API-only imports
    stubbed; returns the module or None."""
    try:
        _shim_sklearn()
        if "langchain_openai" not in sys.modules:
            stub = types.ModuleType("langchain_openai")

            class OpenAIEmbeddings:  # never instantiated by the functions we call
                def __init__(self, *a, **k):
                    pass

            stub.OpenAIEmbeddings = OpenAIEmbeddings
            sys.modules["langchain_openai"] = stub
        return _load(
            "ref_evaluate_itext2kg_merge",
            "/root/reference/evaluation/merge/evaluate_itext2kg_merge.py",
        )
    except Exception:  # pragma: no cover
        return None


def load_reference_distiller():
    """Load the reference DocumentsDistiller class (its combine logic needs
    no LLM — the langchain parser import is stubbed), or None."""
    try:
        for pkg in ("itext2kg", "itext2kg.llm_output_parsing",
                    "itext2kg.documents_distiller"):
            if pkg not in sys.modules:
                m = types.ModuleType(pkg)
                m.__path__ = []
                sys.modules[pkg] = m
        lop = "itext2kg.llm_output_parsing.langchain_output_parser"
        if lop not in sys.modules:
            stub = types.ModuleType(lop)

            class LangchainOutputParser:  # constructor-only stub
                def __init__(self, *a, **k):
                    pass

            stub.LangchainOutputParser = LangchainOutputParser
            sys.modules[lop] = stub
        dd = _load(
            "itext2kg.documents_distiller.documents_distiller",
            f"{REF}/documents_distiller/documents_distiller.py",
        )
        return dd.DocumentsDistiller
    except Exception:  # pragma: no cover
        return None
