"""Service-trace parity (trace.py ← reference sema/commons/service)."""

import pytest

from py_sema_spark.trace import (
    RestartException,
    ServiceResult,
    StatusMonitor,
    Trace,
    TraceEvent,
    TraceMode,
    trace_init,
    traced,
)


class _Result(ServiceResult):
    def __init__(self, ok):
        self._ok = ok

    @property
    def success(self):
        return self._ok


class _Svc(StatusMonitor):
    def __init__(self):
        self.state = "init"

    @property
    def status(self):
        return self.state

    @trace_init(mode=TraceMode.ONCE)
    def process(self):
        self.state = "running"
        self.step("a", depth=1)
        self.state = "done"
        return _Result(True)

    @traced()
    def step(self, name, depth=0):
        return f"did-{name}"


class TestServiceResult:
    def test_truthiness(self):
        assert _Result(True)
        assert not _Result(False)


class TestTraceModes:
    def test_once_raises_on_reentry(self):
        s = _Svc()
        assert s.process()
        with pytest.raises(RestartException):
            s.process()

    def test_keep_reuses_trace(self):
        class S(_Svc):
            @trace_init(mode=TraceMode.KEEP)
            def process(self):
                self.step("x")
                return _Result(True)

        s = S()
        s.process()
        s.process()
        assert len(Trace.extract(s).events) == 2  # same trace accrued

    def test_refresh_replaces_trace(self):
        class S(_Svc):
            @trace_init(mode=TraceMode.REFRESH)
            def process(self):
                self.step("x")
                return _Result(True)

        s = S()
        s.process()
        first = Trace.extract(s)
        s.process()
        assert Trace.extract(s) is not first
        assert len(Trace.extract(s).events) == 1


class TestEventCapture:
    def test_events_carry_status_and_returns(self):
        s = _Svc()
        s.process()
        evts = Trace.extract(s).events
        assert len(evts) == 1
        assert evts[0]["status"] == "running"  # snapshot at call time
        e = evts[0]["event"]
        assert e.name == "step" and e.returns == "did-a"
        assert e.listargs == ("a",) and e.dictargs == {"depth": 1}

    def test_kwargs_named_name_and_returns_survive(self):
        # TraceEvent's own init params are underscore-prefixed (as the
        # reference's Trace.Event) so a traced method called with
        # kwargs literally named "name"/"returns" can't collide
        class S(_Svc):
            @trace_init(mode=TraceMode.REFRESH)
            def process(self):
                return self.configure(name="x", returns=3)

            @traced()
            def configure(self, **kw):
                return "ok"

        s = S()
        assert s.process() == "ok"
        e = Trace.extract(s).events[0]["event"]
        assert e.name == "configure" and e.returns == "ok"
        assert e.dictargs == {"name": "x", "returns": 3}

    def test_untraced_object_runs_clean(self):
        class Bare:
            @traced()
            def step(self):
                return 7

        assert Bare().step() == 7

    def test_custom_event_class_validated(self):
        with pytest.raises(TypeError):
            traced(event_cls=dict)

    def test_monitor_attr_type_checked(self):
        class S:
            mon = "not-a-monitor"

            @trace_init(monitor_attr="mon")
            def process(self):
                return _Result(True)

        with pytest.raises(TypeError):
            S().process()


class TestEventsDf:
    def test_lineage_export(self, spark):
        s = _Svc()
        s.process()
        df = Trace.extract(s).events_df(spark)
        rows = df.collect()
        assert df.columns == ["event", "status", "ts"]
        assert rows[0].event == "step" and rows[0].status == "running"


class TestLogconf:
    def test_yaml_dictconfig_applied(self, tmp_path):
        import logging

        from py_sema_spark.logconf import load_log_config

        conf = tmp_path / "lc.yml"
        conf.write_text(
            "version: 1\ndisable_existing_loggers: false\n"
            "loggers:\n  py_sema_spark.test_lc:\n    level: ERROR\n"
        )
        assert load_log_config(conf) == conf
        assert logging.getLogger("py_sema_spark.test_lc").level == (
            logging.ERROR
        )

    def test_missing_file_raises(self, tmp_path):
        from py_sema_spark.logconf import load_log_config

        with pytest.raises(FileNotFoundError):
            load_log_config(tmp_path / "nope.yml")

    def test_default_fallback_exists(self):
        from py_sema_spark.logconf import DEFAULT_LOGCONF

        assert DEFAULT_LOGCONF.exists()

    def test_cli_accepts_logconf(self, tmp_path, capsys):
        from py_sema_spark.cli import main

        # --logconf parses at the top level; bad path fails cleanly
        with pytest.raises(FileNotFoundError):
            main(
                ["--logconf", str(tmp_path / "missing.yml"),
                 "query", "--triples", "x", "--sparql", "SELECT ?s WHERE { ?s ?p ?o }"]
            )
