"""CLI project generator full cycle (the reference's CliFullCycleTest:
`op gen` must produce a project that actually trains)."""
import os
import sys

from transmogrifai_spark.cli import feature_type, generate, infer_problem


def _write_csv(path, n=120):
    import random
    rng = random.Random(5)
    with open(path, "w") as f:
        f.write("row_id,age,income,segment,signup,churned\n")
        for i in range(n):
            seg = rng.choice(["a", "b", "c"])
            age = rng.randrange(18, 80)
            inc = round(rng.uniform(1e4, 2e5), 2)
            y = int(inc < 5e4 or seg == "c")
            f.write(f"{i},{age},{inc},{seg},2024-01-{1 + i % 28:02d},{y}\n")


def test_feature_type_mapping():
    assert feature_type("BOOLEAN", 2) == "Binary"
    assert feature_type("BIGINT", 1000) == "Integral"
    assert feature_type("DOUBLE", 1000) == "Real"
    assert feature_type("TIMESTAMP", 500) == "Date"
    assert feature_type("VARCHAR", 3) == "PickList"
    assert feature_type("VARCHAR", 5000) == "Text"
    assert infer_problem("Integral", 2) == "binary"
    assert infer_problem("PickList", 5) == "multiclass"
    assert infer_problem("Real", 10000) == "regression"


def test_gen_project_structure(tmp_path):
    src = str(tmp_path / "churn.csv")
    _write_csv(src)
    proj = generate("Churn Model", src, "row_id", "churned",
                    output_dir=str(tmp_path))
    assert os.path.basename(proj) == "churn_model"
    assert sorted(os.listdir(proj)) == ["README.md", "churn_model.py",
                                        "params.json"]
    code = open(os.path.join(proj, "churn_model.py")).read()
    assert "'segment': 'PickList'" in code     # low-cardinality -> PickList
    assert "binary" in code                    # 2-valued response
    assert "LogisticRegression" in code


def test_generated_project_trains(spark, tmp_path, monkeypatch):
    from transmogrifai_spark.params import OpParams
    from transmogrifai_spark.runner import RunParams, run

    src = str(tmp_path / "churn.csv")
    _write_csv(src)
    proj = generate("churn2", src, "row_id", "churned",
                    output_dir=str(tmp_path))
    monkeypatch.syspath_prepend(proj)
    op = OpParams.from_file(os.path.join(proj, "params.json"))
    model = run(RunParams(mode="train", pipeline="churn2", data_dir=proj,
                          op_params=op), spark=spark)
    assert os.path.exists(os.path.join(proj, "model"))
    sel = model.layers[-1][-1].params["selection"]
    assert sel["best_metric"] > 0.5            # the CV selector actually ran
