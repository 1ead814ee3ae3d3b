"""Extraction configuration model (driver-side, broadcast to executors).

Semantics parity with the reference config module
(ref:src/config/mod.rs:7-117): same field names, same defaults
(temperature 0.3, max_tokens 4096, timeout 120, deduplicate/
normalize_uris true), same YAML-or-JSON-by-extension loading, same
validation rules (non-empty questions, non-empty base_uri, non-empty
question ids).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path


class ConfigError(ValueError):
    pass


@dataclass
class ExtractionQuestion:
    # ref:src/config/mod.rs:22-32
    id: str
    question: str
    description: str | None = None
    expected_type: str | None = None
    constraints: list[str] = field(default_factory=list)


@dataclass
class RdfSchema:
    # ref:src/config/mod.rs:34-45
    namespace: str
    prefix: str
    base_uri: str
    predicates: dict[str, str] = field(default_factory=dict)
    classes: dict[str, str] = field(default_factory=dict)
    custom_vocabularies: dict[str, str] = field(default_factory=dict)


@dataclass
class LlmSettings:
    # ref:src/config/mod.rs:57-69, defaults :79-81
    base_url: str = "http://localhost:8000"
    api_key: str | None = None
    model: str = "stub"
    temperature: float = 0.3
    max_tokens: int = 4096
    timeout: int = 120


@dataclass
class PostProcessing:
    # ref:src/config/mod.rs:71-77
    deduplicate: bool = True
    normalize_uris: bool = True


OUTPUT_FORMATS = ("turtle", "json-ld", "n-triples", "rdf-xml", "json")


@dataclass
class Configuration:
    # ref:src/config/mod.rs:7-20
    name: str
    description: str = ""
    version: str = "1.0"
    extraction_questions: list[ExtractionQuestion] = field(default_factory=list)
    rdf_schema: RdfSchema = field(
        default_factory=lambda: RdfSchema(
            namespace="http://example.org/ontology#",
            prefix="ex",
            base_uri="http://example.org/resource/",
        )
    )
    output_format: str = "turtle"
    llm_settings: LlmSettings = field(default_factory=LlmSettings)
    validation_rules: list[str] = field(default_factory=list)
    post_processing: PostProcessing = field(default_factory=PostProcessing)

    # -- loading ------------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> "Configuration":
        qs = [
            ExtractionQuestion(
                id=q.get("id", ""),
                question=q.get("question", ""),
                description=q.get("description"),
                expected_type=q.get("expected_type"),
                constraints=list(q.get("constraints") or []),
            )
            for q in d.get("extraction_questions", [])
        ]
        rs = d.get("rdf_schema", {}) or {}
        schema = RdfSchema(
            namespace=rs.get("namespace", ""),
            prefix=rs.get("prefix", ""),
            base_uri=rs.get("base_uri", ""),
            predicates=dict(rs.get("predicates") or {}),
            classes=dict(rs.get("classes") or {}),
            custom_vocabularies=dict(rs.get("custom_vocabularies") or {}),
        )
        ls = d.get("llm_settings", {}) or {}
        llm = LlmSettings(
            base_url=ls.get("base_url", "http://localhost:8000"),
            api_key=ls.get("api_key"),
            model=ls.get("model", "stub"),
            temperature=float(ls.get("temperature", 0.3)),
            max_tokens=int(ls.get("max_tokens", 4096)),
            timeout=int(ls.get("timeout", 120)),
        )
        pp = d.get("post_processing", {}) or {}
        post = PostProcessing(
            deduplicate=bool(pp.get("deduplicate", True)),
            normalize_uris=bool(pp.get("normalize_uris", True)),
        )
        return cls(
            name=d.get("name", ""),
            description=d.get("description", ""),
            version=str(d.get("version", "1.0")),
            extraction_questions=qs,
            rdf_schema=schema,
            output_format=d.get("output_format", "turtle"),
            llm_settings=llm,
            validation_rules=list(d.get("validation_rules") or []),
            post_processing=post,
        )

    @classmethod
    def from_file(cls, path: str | Path) -> "Configuration":
        # ref:src/config/mod.rs:86-98 — JSON iff extension == "json", else YAML
        path = Path(path)
        content = path.read_text(encoding="utf-8")
        if path.suffix == ".json":
            data = json.loads(content)
        else:
            import yaml

            data = yaml.safe_load(content)
        return cls.from_dict(data or {})

    def validate(self) -> None:
        # ref:src/config/mod.rs:101-117
        if not self.extraction_questions:
            raise ConfigError("No extraction questions defined")
        if not self.rdf_schema.base_uri:
            raise ConfigError("No base URI defined for RDF schema")
        for q in self.extraction_questions:
            if not q.id:
                raise ConfigError(f"Question missing ID: {q.question}")

    @classmethod
    def example(cls) -> "Configuration":
        # ref:src/config/mod.rs:120-184
        return cls(
            name="Example RDF Extraction Config",
            description="Extract organization and person information from documents",
            version="1.0",
            extraction_questions=[
                ExtractionQuestion(
                    id="org_name",
                    question="What organizations are mentioned in the document?",
                    description="Extract names of companies, institutions, or organizations",
                    expected_type="string",
                    constraints=["Must be proper noun", "Full organization name"],
                ),
                ExtractionQuestion(
                    id="person_name",
                    question="What people are mentioned with their roles?",
                    description="Extract person names and their associated roles or titles",
                    expected_type="object",
                    constraints=["Include full name", "Include job title if mentioned"],
                ),
            ],
            rdf_schema=RdfSchema(
                namespace="http://example.org/ontology#",
                prefix="ex",
                base_uri="http://example.org/resource/",
                predicates={
                    "hasName": "Entity has name",
                    "hasRole": "Person has role",
                    "worksFor": "Person works for organization",
                    "locatedIn": "Entity is located in place",
                },
                classes={
                    "Person": "A human being",
                    "Organization": "A company or institution",
                    "Role": "A job title or position",
                },
            ),
            validation_rules=["require_valid_uri", "require_known_predicates"],
        )
