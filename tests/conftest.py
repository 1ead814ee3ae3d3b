from __future__ import annotations

import pytest

from rdf_knowledge_extractor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def example_config():
    from rdf_knowledge_extractor_spark.config import Configuration, RdfSchema

    cfg = Configuration.example()
    cfg.rdf_schema = RdfSchema(
        namespace="http://business.example.org/ontology#",
        prefix="biz",
        base_uri="http://business.example.org/resource/",
        predicates={
            "hasName": "Entity has name",
            "hasRole": "Person has role",
            "worksFor": "Person works for organization",
            "locatedIn": "Entity is located in place",
            "partneredWith": "Company partnership",
        },
    )
    return cfg
