"""Spark standalone mini-cluster management (sandbox scaling evidence).

The north_rule's scaling criterion is throughput efficiency >= 0.8 from N to
4N EXECUTORS. local[N] cannot evidence that honestly: in local mode the
driver (DAG scheduler, Py4J, listener bus) and the python UDF workers share
the same pinned CPUs as the task threads, so low-N throughput is understated
by driver overhead that a real cluster would never charge to executors.

This module launches a real standalone master + taskset-pinned workers on
the local box: the DRIVER and MASTER stay on their own fixed CPU set at
every level (exactly like a real cluster, where the driver node does not
grow when you add executors), while the WORKER processes — and the executor
JVMs and python UDF workers they spawn, which inherit the worker's CPU
affinity — are pinned to N or 4N CPUs. Scaling N -> 4N then varies executor
resources and nothing else.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(os.path.abspath(pyspark.__file__))


def _wait_for(log_path: str, needle: str, timeout_s: float = 30.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        if os.path.exists(log_path):
            with open(log_path, errors="replace") as f:
                if needle in f.read():
                    return
        time.sleep(0.3)
    tail = ""
    if os.path.exists(log_path):
        with open(log_path, errors="replace") as f:
            tail = f.read()[-2000:]
    raise RuntimeError(f"'{needle}' not found in {log_path} within {timeout_s}s:\n{tail}")


def _expand_cpus(spec: str) -> list[int]:
    out: list[int] = []
    for part in spec.split(","):
        if "-" in part:
            lo, hi = part.split("-")
            out.extend(range(int(lo), int(hi) + 1))
        else:
            out.append(int(part))
    return out


class MiniCluster:
    """One standalone master + pinned worker(s) offering `cores` CPUs.

    With per_cpu_workers (the default) one Worker daemon is launched PER
    CPU, each pinned (taskset) to exactly its own CPU — so every executor
    JVM and the python UDF workers it spawns own one CPU outright, exactly
    like executors on separate cluster nodes. Letting all executors float
    over a shared `worker_cpus` affinity mask instead (per_cpu_workers=
    False) measurably inflates the SAME work: the scheduler migrates and
    co-locates JVM/python threads adversarially (measured on this box: the
    raw tokenize kernel alone is 14-26% slower on a shared 4-CPU mask than
    pinned 1:1; the full build's task-seconds inflate 1.5x, JVM GC wall
    14x).
    """

    def __init__(self, cores: int, worker_cpus: str, work_dir: str,
                 port: int = 7077, memory_gb: int = 48,
                 local_dirs: str | None = None,
                 per_cpu_workers: bool = True,
                 executor_cores: int = 1):
        self.cores = cores
        self.worker_cpus = worker_cpus
        self.work_dir = work_dir
        self.port = port
        self.memory_gb = memory_gb
        self.local_dirs = local_dirs  # executor scratch (shuffle/spill)
        self.per_cpu_workers = per_cpu_workers
        # each pinned worker must offer exactly one executor's worth of
        # cores, or the master can never place an executor on it (e.g.
        # spark.executor.cores=2 on a 1-core worker starves forever)
        self.executor_cores = max(1, executor_cores)
        # per-worker memory OFFERING (refined in start() for per-CPU
        # workers): session() validates executor memory against it — an
        # unplaceable ask hangs forever with zero executors, same failure
        # mode as the cores guard below
        self.worker_mem_gb = memory_gb
        self.master_url = f"spark://127.0.0.1:{port}"
        self._procs: list[subprocess.Popen] = []
        self._logs: list = []   # Popen stdout handles, closed in stop()

    @staticmethod
    def cleanup_stale() -> None:
        """Kill leaked master/worker/executor JVMs from crashed prior runs —
        a zombie cluster silently contends with every later measurement.
        Patterns are EXACT class names (the former "org.apache.spark.deploy"
        prefix also matched SparkSubmit, killing every concurrent local-mode
        driver) AND scoped to loopback standalone processes: MiniCluster
        masters bind 127.0.0.1 and its workers register to spark://127.0.0.1,
        so a remote-cluster worker or a YARN executor on the same box is
        never collateral. Executors are matched via the --worker-url their
        standalone worker passes them (spark://Worker@127.0.0.1:...)."""
        for pat in (
            r"org.apache.spark.deploy.master.Master --host 127\.0\.0\.1",
            r"org.apache.spark.deploy.worker.Worker spark://127\.0\.0\.1",
            r"CoarseGrainedExecutorBackend.*Worker@127\.0\.0\.1",
        ):
            subprocess.run(["pkill", "-9", "-f", pat], check=False)
        time.sleep(0.5)

    def start(self) -> "MiniCluster":
        home = _spark_home()
        cp = os.path.join(home, "jars", "*")
        env = {**os.environ, "SPARK_HOME": home,
               # pip-installed pyspark has no launcher/target build dirs; the
               # executor command builder needs the scala version pinned
               "SPARK_SCALA_VERSION": "2.13",
               "PYSPARK_PYTHON": sys.executable,
               "SPARK_LOG_DIR": self.work_dir}
        if self.local_dirs:
            os.makedirs(self.local_dirs, exist_ok=True)
            env["SPARK_LOCAL_DIRS"] = self.local_dirs
        os.makedirs(self.work_dir, exist_ok=True)
        mlog = os.path.join(self.work_dir, "master.log")
        wlog = os.path.join(self.work_dir, "worker.log")
        self._logs.append(open(mlog, "w"))
        self._procs.append(subprocess.Popen(
            ["java", "-cp", cp, "-Xmx1g",
             "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", str(self.port), "--webui-port", "0"],
            stdout=self._logs[-1], stderr=subprocess.STDOUT, env=env,
            start_new_session=True,
        ))
        _wait_for(mlog, "I have been elected leader")
        cpus = _expand_cpus(self.worker_cpus)
        ec = self.executor_cores
        if self.per_cpu_workers and len(cpus) > ec and len(cpus) % ec != 0:
            # falling through to one floating worker over the whole mask is
            # the exact shape the class docstring documents as inflating
            # task-seconds 1.5x — never do it silently
            import logging
            logging.getLogger(__name__).warning(
                "MiniCluster: %d worker CPUs (%s) is not a multiple of "
                "executor_cores=%d; executors will FLOAT over the shared "
                "mask instead of owning pinned CPU groups — scaling numbers "
                "from this shape are not comparable to pinned runs",
                len(cpus), self.worker_cpus, ec)
        if self.per_cpu_workers and len(cpus) > ec and len(cpus) % ec == 0:
            # one worker per executor-sized CPU group, pinned to exactly its
            # group: each executor JVM (and its python UDF workers) owns its
            # CPUs outright, like executors on separate cluster nodes
            groups = [cpus[i:i + ec] for i in range(0, len(cpus), ec)]
            per_mem = max(4, self.memory_gb // len(groups))
            self.worker_mem_gb = per_mem
            wlogs = []
            for i, grp in enumerate(groups):
                wl = os.path.join(self.work_dir, f"worker{i}.log")
                wlogs.append(wl)
                wcmd = ["java", "-cp", cp, "-Xmx1g",
                        "org.apache.spark.deploy.worker.Worker",
                        self.master_url,
                        "--cores", str(ec),
                        "--memory", f"{per_mem}g", "--webui-port", "0",
                        "--work-dir",
                        os.path.join(self.work_dir, f"work{i}")]
                if shutil.which("taskset"):
                    wcmd = ["taskset", "-c",
                            ",".join(str(c) for c in grp)] + wcmd
                wenv = {**env, "SPARK_LOCAL_DIRS":
                        f"{env.get('SPARK_LOCAL_DIRS', self.work_dir)}/w{i}"}
                os.makedirs(wenv["SPARK_LOCAL_DIRS"], exist_ok=True)
                self._logs.append(open(wl, "w"))
                self._procs.append(subprocess.Popen(
                    wcmd, stdout=self._logs[-1], stderr=subprocess.STDOUT,
                    env=wenv, start_new_session=True,
                ))
            for wl in wlogs:
                _wait_for(wl, "Successfully registered with master")
            return self
        wcmd = ["java", "-cp", cp, "-Xmx1g",
                "org.apache.spark.deploy.worker.Worker", self.master_url,
                "--cores", str(self.cores), "--memory", f"{self.memory_gb}g",
                "--webui-port", "0",
                "--work-dir", os.path.join(self.work_dir, "work")]
        if shutil.which("taskset"):
            wcmd = ["taskset", "-c", self.worker_cpus] + wcmd
        self._logs.append(open(wlog, "w"))
        self._procs.append(subprocess.Popen(
            wcmd, stdout=self._logs[-1], stderr=subprocess.STDOUT, env=env,
            start_new_session=True,
        ))
        _wait_for(wlog, "Successfully registered with master")
        return self

    def session(self, executor_cores: int | None = None,
                executor_mem_gb: int | None = None,
                shuffle_partitions: int = 8, app_name: str = "wise_cluster",
                extra_conf: dict | None = None):
        from pyspark.sql import SparkSession

        from .session import get_spark

        # executor cores default to the cluster's worker size; a LARGER ask
        # can never be placed on any worker — the app registers, gets zero
        # executors, and the first action hangs forever with only scheduler
        # 'not accepted any resources' warnings
        if executor_cores is None:
            executor_cores = self.executor_cores
        if self.per_cpu_workers and executor_cores > self.executor_cores:
            raise ValueError(
                f"executor_cores={executor_cores} exceeds this cluster's "
                f"worker size ({self.executor_cores}); no executor can ever "
                "be placed — pass executor_cores to MiniCluster(...) too")
        # same unplaceable-ask hang for MEMORY: an executor asking more than
        # any worker offers registers with zero executors and the first
        # action waits forever on 'not accepted any resources' warnings
        if executor_mem_gb is None:
            executor_mem_gb = min(8, self.worker_mem_gb)
        elif executor_mem_gb > self.worker_mem_gb:
            raise ValueError(
                f"executor_mem_gb={executor_mem_gb} exceeds the per-worker "
                f"offering ({self.worker_mem_gb}g); no executor can ever be "
                "placed — raise MiniCluster(memory_gb=...) or lower the ask")
        # getOrCreate silently returns ANY live session, dropping master and
        # every conf below — a pre-existing local session would masquerade
        # as the cluster and invalidate scaling measurements with no error.
        # getActiveSession is THREAD-LOCAL, so also check the process-wide
        # default that getOrCreate actually falls back to
        active = SparkSession.getActiveSession()
        if active is None:
            active = getattr(SparkSession, "_instantiatedSession", None)
        if active is not None and active.sparkContext.master != self.master_url:
            raise RuntimeError(
                f"a SparkSession on master={active.sparkContext.master!r} is "
                f"already active; stop it before MiniCluster.session() — "
                "getOrCreate would silently reuse it instead of connecting "
                f"to {self.master_url}")

        conf = {
            "spark.executor.cores": str(executor_cores),
            "spark.executor.memory": f"{executor_mem_gb}g",
            # glibc: keep large (numpy/Arrow) allocations in the sbrk arena
            # instead of mmap/munmap pairs — every munmap fires TLB-shootdown
            # IPIs to every CPU in the affinity mask, so the per-allocation
            # kernel cost GROWS with executor width (measured: 43% system
            # time at 16 CPUs, build slower than at 4). Python UDF workers
            # inherit the executor's environment.
            "spark.executorEnv.MALLOC_MMAP_THRESHOLD_": "536870912",
            "spark.executorEnv.MALLOC_TRIM_THRESHOLD_": "536870912",
            "spark.executorEnv.MALLOC_MMAP_MAX_": "0",
            # pyarrow's bundled jemalloc ignores the glibc tunables above and
            # returns dirty pages to the kernel on its decay schedule — every
            # Arrow batch then refaults its buffers (a VM exit per first
            # touch under firecracker). The system pool routes Arrow through
            # glibc malloc, which the tunables pin to a recycled arena.
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL": os.environ.get(
                "WISE_ARROW_POOL", "system"),
            # each executor JVM must size its GC/JIT thread pools to ITS core
            # share, not the worker's whole affinity set — otherwise 4
            # co-located executors each spawn worker-width GC threads and
            # thrash each other (measured: 3x slowdown at the 4-executor
            # level without this)
            # Keep the executor heap SMALL and growable. First-touch page
            # faults are pathologically expensive on this kernel, so a big
            # heap is a tax however it is paged in: -Xms=-Xmx spreads G1
            # allocation over gigabytes of virgin pages all run long
            # (measured: 3x slower build), AlwaysPreTouch pays minutes at
            # launch. A small -Xmx keeps G1 recycling the same already-
            # faulted pages; the build's data lives in python workers and
            # packed Arrow batches, not the JVM heap.
            "spark.executor.extraJavaOptions":
                f"-XX:ActiveProcessorCount={executor_cores}",
            "spark.pyspark.python": sys.executable,
            "spark.driver.memory": "8g",
        }
        if extra_conf:
            conf.update(extra_conf)
        return get_spark(
            master=self.master_url, app_name=app_name,
            shuffle_partitions=shuffle_partitions, extra_conf=conf,
        )

    def stop(self) -> None:
        for p in reversed(self._procs):
            p.terminate()
        for p in reversed(self._procs):
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        self._procs.clear()
        for f in self._logs:
            try:
                f.close()
            except OSError:
                pass
        self._logs.clear()

    def __enter__(self) -> "MiniCluster":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
