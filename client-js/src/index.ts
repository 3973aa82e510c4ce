/**
 * Open Speech TPU — TypeScript/JavaScript client SDK.
 *
 * Same public surface as the reference SDK (client-js/src/index.ts):
 * fetch-based transcribe/speak, browser-microphone streamTranscribe over the
 * /v1/audio/stream WebSocket, and a RealtimeSession for /v1/realtime.
 */

export type TranscriptionResult = { text: string; [k: string]: unknown };
export type TranscriptionEvent = { type: string; [k: string]: unknown };

export type ClientOptions = {
  baseUrl?: string;
  apiKey?: string;
};

type RealtimeCallback = (event: any) => void;

/** Map an http(s) base URL + path to the matching ws(s) URL. Already-ws
 * bases and bare hosts pass through with the path appended. */
function toWsUrl(baseUrl: string, path: string): string {
  try {
    const u = new URL(path, baseUrl);
    if (u.protocol === "http:") u.protocol = "ws:";
    else if (u.protocol === "https:") u.protocol = "wss:";
    return u.toString();
  } catch {
    return `${baseUrl}${path}`; // schemeless base: trust the caller
  }
}

/** Float32 [-1, 1] samples to little-endian int16 PCM. Negative full scale
 * uses the full -32768 lattice point (the usual WAV convention). */
export function f32ToPcm16(input: Float32Array): ArrayBuffer {
  const out = new Int16Array(input.length);
  input.forEach((v, i) => {
    const s = v <= -1 ? -1 : v >= 1 ? 1 : v;
    out[i] = s * (s < 0 ? 0x8000 : 0x7fff);
  });
  return out.buffer;
}

export class OpenSpeechClient {
  baseUrl: string;
  apiKey?: string;

  constructor({ baseUrl = "http://localhost:8100", apiKey }: ClientOptions = {}) {
    this.baseUrl = baseUrl.replace(/\/$/, "");
    this.apiKey = apiKey;
  }

  private headers(contentType?: string): Record<string, string> {
    return {
      ...(this.apiKey ? { Authorization: `Bearer ${this.apiKey}` } : {}),
      ...(contentType ? { "Content-Type": contentType } : {}),
    };
  }

  /** Transcribe an audio blob/buffer via POST /v1/audio/transcriptions. */
  async transcribe(
    audio: Blob | ArrayBuffer,
    options: { model?: string; language?: string; response_format?: string } = {}
  ): Promise<TranscriptionResult> {
    const form = new FormData();
    const blob =
      audio instanceof Blob ? audio : new Blob([audio], { type: "audio/wav" });
    form.append("file", blob, "audio.wav");
    if (options.model) form.append("model", options.model);
    if (options.language) form.append("language", options.language);
    if (options.response_format)
      form.append("response_format", options.response_format);
    const r = await fetch(`${this.baseUrl}/v1/audio/transcriptions`, {
      method: "POST",
      headers: this.headers(),
      body: form,
    });
    if (!r.ok) throw new Error(`Transcribe failed (${r.status})`);
    return (await r.json()) as TranscriptionResult;
  }

  /** Synthesize speech via POST /v1/audio/speech. */
  async speak(
    text: string,
    options: {
      voice?: string;
      model?: string;
      speed?: number;
      response_format?: string;
      voice_design?: string;
    } = {}
  ): Promise<Blob> {
    const body: Record<string, unknown> = {
      model: options.model ?? "kokoro",
      input: text,
      voice: options.voice ?? "alloy",
      speed: options.speed ?? 1.0,
      response_format: options.response_format ?? "mp3",
    };
    if (options.voice_design) body.voice_design = options.voice_design;
    const r = await fetch(`${this.baseUrl}/v1/audio/speech`, {
      method: "POST",
      headers: this.headers("application/json"),
      body: JSON.stringify(body),
    });
    if (!r.ok) throw new Error(`Speak failed (${r.status})`);
    return await r.blob();
  }

  /**
   * Stream microphone audio to /v1/audio/stream and yield transcript events.
   * Browser-only (AudioContext + ScriptProcessor -> PCM16 frames).
   */
  async *streamTranscribe(
    mediaStream: MediaStream,
    options: { model?: string; vad?: boolean } = {}
  ): AsyncIterableIterator<TranscriptionEvent> {
    const ctx = new AudioContext();
    const rate = ctx.sampleRate;
    const params = new URLSearchParams({
      sample_rate: String(rate),
      vad: options.vad === false ? "false" : "true",
    });
    if (options.model) params.set("model", options.model);
    if (this.apiKey) params.set("api_key", this.apiKey);
    const ws = new WebSocket(
      `${toWsUrl(this.baseUrl, "/v1/audio/stream")}?${params}`
    );

    const queue: TranscriptionEvent[] = [];
    let resolveNext: ((e: TranscriptionEvent | null) => void) | null = null;
    let done = false;

    ws.onmessage = (evt) => {
      const event = JSON.parse(evt.data as string) as TranscriptionEvent;
      if (resolveNext) {
        resolveNext(event);
        resolveNext = null;
      } else {
        queue.push(event);
      }
      if (event.type === "session.end") done = true;
    };
    ws.onclose = () => {
      done = true;
      if (resolveNext) resolveNext(null);
    };

    const source = ctx.createMediaStreamSource(mediaStream);
    const node = ctx.createScriptProcessor(4096, 1, 1);
    node.onaudioprocess = (e) => {
      if (ws.readyState === WebSocket.OPEN) {
        ws.send(f32ToPcm16(e.inputBuffer.getChannelData(0)));
      }
    };
    source.connect(node);
    node.connect(ctx.destination);

    try {
      while (!done || queue.length > 0) {
        const event =
          queue.shift() ??
          (await new Promise<TranscriptionEvent | null>((res) => {
            resolveNext = res;
          }));
        if (event === null) break;
        yield event;
        if (event.type === "session.end") break;
      }
    } finally {
      node.disconnect();
      source.disconnect();
      void ctx.close();
      if (ws.readyState === WebSocket.OPEN) {
        ws.send(JSON.stringify({ type: "stop" }));
        ws.close();
      }
    }
  }

  /** Open a Realtime API session on /v1/realtime. */
  realtimeSession(model = ""): RealtimeSession {
    const params = new URLSearchParams();
    if (model) params.set("model", model);
    if (this.apiKey) params.set("api_key", this.apiKey);
    const qs = params.toString();
    const url = `${toWsUrl(this.baseUrl, "/v1/realtime")}${qs ? `?${qs}` : ""}`;
    return new RealtimeSession(url);
  }
}

export class RealtimeSession {
  private ws: WebSocket;
  private transcriptCbs: RealtimeCallback[] = [];
  private audioCbs: RealtimeCallback[] = [];
  private vadCbs: RealtimeCallback[] = [];

  constructor(url: string) {
    this.ws = new WebSocket(url, ["realtime"]);
    this.ws.onmessage = (evt) => {
      const event = JSON.parse(evt.data as string);
      const t: string = event.type ?? "";
      if (t.includes("transcription") || t === "conversation.item.created") {
        this.transcriptCbs.forEach((cb) => cb(event));
      } else if (t.startsWith("response.audio")) {
        this.audioCbs.forEach((cb) => cb(event));
      } else if (t.includes("speech_")) {
        this.vadCbs.forEach((cb) => cb(event));
      }
    };
  }

  ready(): Promise<void> {
    if (this.ws.readyState === WebSocket.OPEN) return Promise.resolve();
    return new Promise((res, rej) => {
      this.ws.addEventListener("open", () => res(), { once: true });
      this.ws.addEventListener("error", (e) => rej(e), { once: true });
    });
  }

  private send(payload: unknown): void {
    this.ws.send(JSON.stringify(payload));
  }

  /** Append base64 pcm16 (24 kHz) audio to the input buffer. */
  sendAudio(chunk: ArrayBuffer): void {
    const bytes = new Uint8Array(chunk);
    let binary = "";
    for (const b of bytes) binary += String.fromCharCode(b);
    this.send({ type: "input_audio_buffer.append", audio: btoa(binary) });
  }

  commit(): void {
    this.send({ type: "input_audio_buffer.commit" });
  }

  createResponse(text: string, voice = "alloy"): void {
    this.send({
      type: "response.create",
      response: { instructions: text, voice, modalities: ["audio", "text"] },
    });
  }

  onTranscript(cb: RealtimeCallback): void {
    this.transcriptCbs.push(cb);
  }
  onAudio(cb: RealtimeCallback): void {
    this.audioCbs.push(cb);
  }
  onVad(cb: RealtimeCallback): void {
    this.vadCbs.push(cb);
  }

  close(): void {
    this.ws.close();
  }
}
