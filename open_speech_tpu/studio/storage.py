"""Studio persistence: per-thread SQLite connections + schema.

Table layout is kept column-compatible with the reference server
(src/storage.py DDL) so studio databases are portable between the two; the
connection/bootstrap plumbing is this module's own.

Connections are THREAD-LOCAL, not one shared handle: the app runs
conversation/composer renders in executor threads concurrently with
event-loop manager calls (history logging, profile CRUD), and a shared
``check_same_thread=False`` connection lets one request's ``commit()``
persist another's half-finished multi-statement transaction (e.g. a failed
render's partial turn UPDATEs, or a torn ``set_default`` pair). WAL mode
gives concurrent readers + a single serialized writer per *connection*, so
one-connection-per-thread makes every manager call transactionally
isolated with zero changes at the call sites.
"""

from __future__ import annotations

import sqlite3
import threading
from pathlib import Path

from open_speech_tpu.config import settings


class _Store:
    """Lazily-opened thread-local SQLite handles (WAL, FKs, row factory)."""

    def __init__(self) -> None:
        self._local = threading.local()
        self._guard = threading.Lock()
        # bumped by close(): stale thread-local conns (old DB path in
        # tests) notice and reopen
        self._generation = 0

    def connection(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is not None:
            if getattr(self._local, "gen", -1) == self._generation:
                return conn
            conn.close()
        target = Path(settings.os_studio_db_path)
        target.parent.mkdir(parents=True, exist_ok=True)
        conn = sqlite3.connect(str(target))
        conn.row_factory = sqlite3.Row
        for pragma in (
            "journal_mode=WAL",
            "foreign_keys=ON",
            "busy_timeout=5000",
        ):
            conn.execute(f"PRAGMA {pragma}")
        self._local.conn = conn
        self._local.gen = self._generation
        return conn

    def bootstrap(self) -> None:
        conn = self.connection()
        for ddl in _TABLES:
            conn.executescript(ddl)
        conn.commit()

    def close(self) -> None:
        with self._guard:
            self._generation += 1
        conn = getattr(self._local, "conn", None)
        if conn is not None:
            conn.close()
            self._local.conn = None


_store = _Store()


def get_db() -> sqlite3.Connection:
    return _store.connection()


def init_db() -> None:
    _store.bootstrap()


def reset_db() -> None:
    """Close the shared connection (tests switch DB paths between cases)."""
    _store.close()


# Column-compatible with the reference schema; one statement per table.
_TABLES = (
    """
    create table if not exists profiles (
        id text primary key,
        name text not null unique,
        backend text not null,
        model text,
        voice text not null,
        speed real not null default 1.0,
        format text not null default 'mp3',
        blend text,
        reference_audio_id text,
        effects_json text,
        is_default integer not null default 0,
        created_at text not null,
        updated_at text not null
    );
    """,
    """
    create table if not exists history_entries (
        id text primary key,
        type text not null check(type in ('tts','stt')),
        created_at text not null,
        model text,
        voice text,
        speed real,
        format text,
        text_preview text,
        full_text text,
        input_filename text,
        output_path text,
        output_bytes integer,
        streamed integer not null default 0,
        meta_json text
    );
    create index if not exists idx_history_type_created
        on history_entries(type, created_at desc);
    """,
    """
    create table if not exists conversations (
        id text primary key,
        name text,
        created_at text not null,
        updated_at text not null,
        render_output_path text,
        meta_json text
    );
    """,
    """
    create table if not exists conversation_turns (
        id text primary key,
        conversation_id text not null,
        turn_index integer not null,
        speaker text not null,
        profile_id text,
        text text not null,
        audio_path text,
        duration_ms integer,
        effects_json text,
        created_at text not null,
        foreign key(conversation_id)
            references conversations(id) on delete cascade
    );
    create index if not exists idx_turns_conv
        on conversation_turns(conversation_id, turn_index);
    """,
    """
    create table if not exists compositions (
        id text primary key,
        name text,
        sample_rate integer not null default 24000,
        created_at text not null,
        updated_at text not null,
        render_output_path text,
        tracks_json text,
        meta_json text
    );
    """,
)

# kept for callers/tests that want the full DDL in one string
SCHEMA_SQL = "\n".join(_TABLES)
