"""Async batch-job subsystem (SURVEY.md §2.10, Q1-Q6).

The reference keeps an in-memory job registry driven by FastAPI
background tasks (``src/core/job_manager.py``): UUID jobs, status enum
{queued, processing, completed, failed, cancelled}, progress %,
per-document results, cancel, 24h GC. Here the same contract runs jobs
as Spark actions on background threads:

- each job's Spark stages run under a dedicated job group, so
  ``cancel`` maps to ``sparkContext.cancelJobGroup`` — real work
  cancellation, not just a flag (Q4);
- per-document error isolation (``src/api/documents.py:465-472``)
  is the ingest pipeline's rejected side-output — a failed row can't
  kill the batch, so job "results" carry accepted/rejected counts;
- the registry itself is driver-resident like the reference's
  (non-durable; ``src/core/job_manager.py:79-80``) — a ``jobs`` table
  write in ``complete``/``fail`` would make it durable; kept simple
  deliberately.
"""

from __future__ import annotations

import threading
import time
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import SparkSession


class JobStatus(str, Enum):
    QUEUED = "queued"
    PROCESSING = "processing"
    COMPLETED = "completed"
    FAILED = "failed"
    CANCELLED = "cancelled"


TERMINAL = {JobStatus.COMPLETED, JobStatus.FAILED, JobStatus.CANCELLED}


@dataclass
class BatchJob:
    job_id: str
    total_documents: int
    status: JobStatus = JobStatus.QUEUED
    processed_documents: int = 0
    successful_documents: int = 0
    failed_documents: int = 0
    created_at: float = field(default_factory=time.time)
    updated_at: float = field(default_factory=time.time)
    # None until the job actually leaves the queue (reference JobStatus
    # model: started_at is null for pending/queued jobs).
    started_at: float | None = None
    result: dict | None = None
    error: str | None = None

    @property
    def progress_percent(self) -> float:
        if self.total_documents <= 0:
            return 0.0
        return round(self.processed_documents / self.total_documents * 100.0, 2)

    def to_dict(self) -> dict:
        return {
            "job_id": self.job_id,
            "status": self.status.value,
            "total_documents": self.total_documents,
            "processed_documents": self.processed_documents,
            "successful_documents": self.successful_documents,
            "failed_documents": self.failed_documents,
            "progress_percent": self.progress_percent,
            "created_at": self.created_at,
            "updated_at": self.updated_at,
            "started_at": self.started_at,
            "result": self.result,
            "error": self.error,
        }


class JobManager:
    """Q1-Q6 over background Spark actions."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._jobs: dict[str, BatchJob] = {}
        self._threads: dict[str, threading.Thread] = {}
        self._lock = threading.Lock()

    # Q1 — create/queue
    def create_job(self, total_documents: int) -> BatchJob:
        job = BatchJob(job_id=str(uuid.uuid4()), total_documents=total_documents)
        with self._lock:
            self._jobs[job.job_id] = job
        return job

    # Q2 — background execution under a cancellable job group
    def submit(self, job: BatchJob, body: Callable[[BatchJob], dict]) -> None:
        def _run():
            sc = self.spark.sparkContext
            sc.setJobGroup(job.job_id, f"batch job {job.job_id}", interruptOnCancel=True)
            self._transition(job, JobStatus.PROCESSING)
            try:
                result = body(job)
            except Exception as e:  # noqa: BLE001
                if job.status != JobStatus.CANCELLED:
                    self.fail(job.job_id, str(e))
                return
            finally:
                sc.setJobGroup("", "")
            if job.status != JobStatus.CANCELLED:
                self.complete(job.job_id, result)

        t = threading.Thread(target=_run, daemon=True, name=f"job-{job.job_id[:8]}")
        with self._lock:
            self._threads[job.job_id] = t
        t.start()

    def run_sync(self, job: BatchJob, body: Callable[[BatchJob], dict]) -> BatchJob:
        """Q6 — same body inline (the reference's sync mode,
        ``src/api/documents.py:274-298``)."""
        self._transition(job, JobStatus.PROCESSING)
        try:
            result = body(job)
        except Exception as e:  # noqa: BLE001
            self.fail(job.job_id, str(e))
            return job
        self.complete(job.job_id, result)
        return job

    # Q3 — status / progress
    def get_job(self, job_id: str) -> BatchJob | None:
        return self._jobs.get(job_id)

    def update_progress(self, job_id: str, processed: int,
                        succeeded: int = 0, failed: int = 0) -> None:
        job = self._jobs[job_id]
        job.processed_documents = processed
        job.successful_documents = succeeded
        job.failed_documents = failed
        job.updated_at = time.time()

    def complete(self, job_id: str, result: dict | None = None) -> None:
        job = self._jobs[job_id]
        if job.status in TERMINAL:
            return
        job.result = result
        self._transition(job, JobStatus.COMPLETED)

    def fail(self, job_id: str, error: str) -> None:
        job = self._jobs[job_id]
        if job.status in TERMINAL:
            return
        job.error = error
        self._transition(job, JobStatus.FAILED)

    # Q4 — cancel: terminal states un-cancellable (job_manager.py:139-162)
    def cancel_job(self, job_id: str) -> bool:
        job = self._jobs.get(job_id)
        if job is None or job.status in TERMINAL:
            return False
        self._transition(job, JobStatus.CANCELLED)
        self.spark.sparkContext.cancelJobGroup(job_id)
        return True

    # P8/T4 — list with status filter, recency order, limit
    def list_jobs(self, status: str | None = None, limit: int = 100) -> list[BatchJob]:
        jobs = list(self._jobs.values())
        if status is not None:
            try:
                st = JobStatus(status)
            except ValueError:
                return []  # invalid status → empty (job_manager.py:122-129)
            jobs = [j for j in jobs if j.status == st]
        jobs.sort(key=lambda j: j.created_at, reverse=True)
        return jobs[:limit]

    # Q5/P9 — GC terminal jobs older than max_age_hours
    def cleanup_old_jobs(self, max_age_hours: float = 24.0) -> int:
        cutoff = time.time() - max_age_hours * 3600
        with self._lock:
            doomed = [
                jid for jid, j in self._jobs.items()
                if j.status in TERMINAL and j.created_at < cutoff
            ]
            for jid in doomed:
                del self._jobs[jid]
                self._threads.pop(jid, None)
        return len(doomed)

    # A3 — counts by status
    def counts_by_status(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for j in self._jobs.values():
            out[j.status.value] = out.get(j.status.value, 0) + 1
        return out

    def wait(self, job_id: str, timeout: float = 60.0) -> BatchJob:
        t = self._threads.get(job_id)
        if t is not None:
            t.join(timeout)
        return self._jobs[job_id]

    def _transition(self, job: BatchJob, status: JobStatus) -> None:
        job.status = status
        job.updated_at = time.time()
        if status is JobStatus.PROCESSING and job.started_at is None:
            job.started_at = job.updated_at
