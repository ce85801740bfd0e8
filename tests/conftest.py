import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pysemanticcomplexity_spark.session import get_spark
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def dims(spark):
    from pysemanticcomplexity_spark import fixtures
    return fixtures.spark_dims(spark)


@pytest.fixture(scope="session")
def pages60():
    from pysemanticcomplexity_spark import fixtures
    return fixtures.pages(60)


@pytest.fixture(scope="session")
def pages60_df(spark):
    from pysemanticcomplexity_spark import fixtures
    return fixtures.spark_pages(spark, 60)


@pytest.fixture(scope="session")
def oracle60(pages60):
    from pysemanticcomplexity_spark import fixtures, ref_semantics as R
    return R.run_reference_pipeline(
        pages60, fixtures.gazetteer(), fixtures.instance_types(),
        fixtures.kb_triples(), fixtures.ontology_edges())


@pytest.fixture(scope="session")
def pipeline_result(spark, dims, pages60_df):
    from pysemanticcomplexity_spark import fixtures
    from pysemanticcomplexity_spark.pipeline import KGPipeline
    pipe = KGPipeline(spark, fixtures.gazetteer(), fixtures.ontology_edges(),
                      dims["instance_types"], dims["kb_triples"])
    return pipe.run(pages60_df)
