"""Socket API server (reference `umbrella/api/server.py`).

Thread per connection feeding a queue; by default a single worker thread serializes
requests into `engine.generate(**message)` — the TPU never sees concurrency, matching
the reference's one-request-at-a-time contract (`server.py:43-55`). `{"terminate":
true}` closes a connection.

Beyond the reference: `"engine": "batched_static"` in the config (or an injected
`batcher`) switches to continuous batching — concurrent clients' requests are
admitted into the multi-slot engine's free slots and decode TOGETHER in one compiled
step (serving/batched_engine.py); responses return per-request as slots finish. The
reference cannot do this (its KV cache has no batch dim, ref `attn/cache.py:18-34`).

A `"scheduler": {...}` config key (or an injected `scheduler`) routes requests
through serving/scheduler.Scheduler instead: a priority queue in front of the
backend — single engine or ContinuousBatcher (B admission workers) — with
per-request `"priority"` (lower = sooner) and queue/busy metrics, readable by a
client via `{"get_metrics": true}`. The scheduling layer the reference lacks
(SURVEY.md §1: one mutex-guarded worker, ref `server.py:43-55`).
"""
from __future__ import annotations

import socket
import threading
from queue import Queue

from ..speculation.auto_engine import AutoEngine
from ..utils import TextColors, setup_logger
from .api_utils import receive_data, send_data

logger = setup_logger()


class APIServer:
    def __init__(self, config: dict, device=None, port: int = 65432,
                 max_client: int = 4, host: str = "127.0.0.1", engine=None,
                 batcher=None, scheduler=None):
        self.port = port
        self.max_client = max_client
        self.host = host
        self.device = device
        self.config = config
        self.engine = engine  # injectable for tests
        self.batcher = batcher  # injectable: ContinuousBatcher => concurrent serving
        self.scheduler = scheduler  # injectable: Scheduler => priority queue

    def handle_client(self, conn, addr):
        logger.info(TextColors.colorize(f"Connection from {addr}", "cyan"))
        send_lock = threading.Lock()  # batched futures may complete out of order
        try:
            send_data(conn, {"status": "connected", "message": "Welcome to the server!"})
            while True:
                try:
                    received = receive_data(conn)
                    logger.info(TextColors.colorize(
                        f"Received dictionary from {addr}", "cyan"))
                    if received.get("terminate", False):
                        break
                    # "stream": true => 0+ partial frames {"partial": true,
                    # "generated_text": text_so_far, "perf": str, "req_id": id}
                    # precede the final result dict ({"processed": true}).
                    # req_id (client-chosen, echoed verbatim) lets a client
                    # pipelining several requests on one connection pair frames
                    # with requests; frames of concurrent batched requests
                    # interleave on the wire.
                    stream = bool(received.pop("stream", False))
                    req_id = received.pop("req_id", None)
                    stream_cb = (self._make_stream_cb(conn, addr, send_lock,
                                                      req_id)
                                 if stream else None)
                    if self.scheduler is not None:
                        if received.get("get_metrics", False):
                            with send_lock:
                                send_data(conn, dict(
                                    self.scheduler.snapshot_metrics(),
                                    processed=True))
                            continue
                        priority = int(received.pop("priority", 10))
                        fut = self.scheduler.submit(
                            priority=priority, stream_cb=stream_cb, **received)
                        fut.add_done_callback(
                            lambda f, c=conn, a=addr, lk=send_lock, r=req_id:
                            self._send_result(c, a, lk, f, r))
                    elif self.batcher is not None:
                        if stream_cb is not None:
                            received["stream_cb"] = stream_cb
                        fut = self.batcher.submit(**received)
                        fut.add_done_callback(
                            lambda f, c=conn, a=addr, lk=send_lock, r=req_id:
                            self._send_result(c, a, lk, f, r))
                    else:
                        self.message_queue.put(
                            (addr, conn, received, stream_cb, req_id, send_lock))
                except Exception as e:
                    logger.error(TextColors.colorize(
                        f"Error handling data from {addr}: {e}", "red"))
                    break
        finally:
            conn.close()
            logger.info(TextColors.colorize(f"Connection with {addr} closed", "cyan"))

    def _make_stream_cb(self, conn, addr, send_lock, req_id):
        def cb(text, perf):
            frame = {"partial": True, "generated_text": text,
                     "perf": perf if isinstance(perf, str) else None}
            if req_id is not None:
                frame["req_id"] = req_id
            try:
                with send_lock:
                    send_data(conn, frame)
            except Exception as e:
                logger.error(TextColors.colorize(
                    f"Error streaming to {addr}: {e}", "red"))
        return cb

    def _send_result(self, conn, addr, send_lock, fut, req_id=None):
        try:
            result = fut.result()
            processed = {**result, "processed": True,
                         "response": "Processed successfully"}
        except Exception as e:  # e.g. scheduler DeadlineExpired
            processed = {"processed": False, "error": f"{type(e).__name__}: {e}",
                         "generated_text": "", "generated_tokens": [],
                         "avg_accept_tokens": 0, "time_per_output_token": 0}
        if req_id is not None:
            processed["req_id"] = req_id
        try:
            with send_lock:
                send_data(conn, processed)
        except Exception as e:
            logger.error(TextColors.colorize(
                f"Error sending data to {addr}: {e}", "red"))

    def process_queue(self):
        while True:
            item = self.message_queue.get()
            if item[2] is None:  # shutdown sentinel
                return
            addr, conn, message, stream_cb, req_id, send_lock = item
            with self.queue_lock:
                # A failing generate (bad request args, a compile error at a
                # new shape) must fail THAT client, not kill this worker
                # thread — an uncaught exception here would leave every later
                # request sitting in the queue forever (the batched path's
                # ContinuousBatcher._guarded makes the same guarantee).
                try:
                    if stream_cb is not None:
                        partial = perf = None
                        for partial, perf in self.engine.generate_stream(**message):
                            stream_cb(partial, perf)
                        output = perf if isinstance(perf, dict) else {
                            "generated_text": partial or "", "perf": perf}
                    else:
                        output = self.engine.generate(**message)
                    processed = {**output, "processed": True,
                                 "response": "Processed successfully"}
                except Exception as e:
                    logger.exception("generate failed for %s", addr)
                    processed = {
                        "processed": False,
                        "error": f"{type(e).__name__}: {e}",
                        "generated_text": "", "generated_tokens": [],
                        "avg_accept_tokens": 0, "time_per_output_token": 0}
                if req_id is not None:
                    processed["req_id"] = req_id
                try:
                    with send_lock:
                        send_data(conn, processed)
                except Exception as e:
                    logger.error(TextColors.colorize(
                        f"Error sending data to {addr}: {e}", "red"))

    def start(self):
        """Initialize engine + listener and spawn worker threads (non-blocking)."""
        sched_cfg = self.config.get("scheduler")
        if self.engine is None and self.batcher is None and self.scheduler is None:
            config = {k: v for k, v in self.config.items() if k != "scheduler"}
            batched = config.get("engine") == "batched_static"
            engine = AutoEngine.from_config(self.device, **config)
            engine.initialize()
            if batched:
                from ..serving.batched_engine import ContinuousBatcher

                self.batcher = ContinuousBatcher(engine)
            else:
                self.engine = engine
        if sched_cfg is not None and self.scheduler is None:
            from ..serving.scheduler import make_scheduler

            workers = sched_cfg.get("workers") if isinstance(sched_cfg, dict) else None
            self.scheduler = make_scheduler(
                engine=self.engine, batcher=self.batcher, workers=workers)
            self.engine = None  # requests route through the scheduler only
        if self.batcher is not None and getattr(self.batcher, "_thread", None) is None:
            self.batcher.start()
        if self.scheduler is not None and not self.scheduler._workers:
            self.scheduler.start()
        self.server_socket = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.server_socket.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.server_socket.bind((self.host, self.port))
        if self.port == 0:
            self.port = self.server_socket.getsockname()[1]
        self.server_socket.listen(self.max_client)
        logger.info(TextColors.colorize("umbrella_tpu LLM server started", "cyan"))
        self.message_queue = Queue()
        self.queue_lock = threading.Lock()
        if self.batcher is None and self.scheduler is None:
            threading.Thread(target=self.process_queue, daemon=True).start()
        self._accept_thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._accept_thread.start()

    def _accept_loop(self):
        while True:
            try:
                conn, addr = self.server_socket.accept()
            except OSError:
                return  # socket closed
            threading.Thread(target=self.handle_client, args=(conn, addr),
                             daemon=True).start()

    def run(self):
        """Blocking entry point (reference `server.py:57-74`)."""
        self.start()
        self._accept_thread.join()

    def shutdown(self):
        try:
            if self.scheduler is not None:
                self.scheduler.shutdown(wait=False)
            if self.batcher is not None:
                self.batcher.shutdown()
            self.message_queue.put((None, None, None))
            self.server_socket.close()
        except Exception:
            pass
