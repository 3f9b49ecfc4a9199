// xrit_io — native host-runtime core for xritdemod_tpu.
//
// The reference's runtime around the DSP is C++ (SatHelper CircularBuffer,
// TcpClient/TcpServer, sample normalization; see
// /root/reference/demodulator/src/demodulator.cpp:38,54-74 and
// SymbolManager.cpp).  This library provides the TPU host equivalents as a
// small C ABI consumed from Python via ctypes (no pybind11 in this image):
//
//   * spsc ring buffer: lock-free single-producer/single-consumer float
//     ring with blocking pop (the ingest FIFO between SDR driver threads
//     and the device-block loop)
//   * sample normalization: interleaved u8/s16 IQ -> float32 (the frontend
//     LUT paths: RtlFrontend.cpp:26-28, SDRPlayFrontend.cpp:29-32)
//   * symbol quantization: float soft symbols *127 clamped to int8
//     (SymbolManager.cpp:43-46), with deinterleave of complex pairs
//   * blocking TCP client/server helpers with timeouts (SatHelper
//     TcpClient/TcpServer equivalents)
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// SPSC ring buffer (floats).  Lock-free fast path; a mutex+condvar pair is
// used only to sleep/wake blocked consumers/producers.
// ---------------------------------------------------------------------------

struct XritRing {
    float *data;
    size_t capacity;            // power of two
    size_t mask;
    std::atomic<size_t> head;   // write index (producer)
    std::atomic<size_t> tail;   // read index (consumer)
    std::mutex m;
    std::condition_variable cv_data;
    std::condition_variable cv_space;
    std::atomic<bool> closed;
    std::atomic<uint64_t> overflows;
};

static size_t next_pow2(size_t v) {
    size_t p = 1;
    while (p < v) p <<= 1;
    return p;
}

XritRing *xrit_ring_create(size_t capacity) {
    auto *r = new XritRing();
    r->capacity = next_pow2(capacity);
    r->mask = r->capacity - 1;
    r->data = new float[r->capacity];
    r->head = 0;
    r->tail = 0;
    r->closed = false;
    r->overflows = 0;
    return r;
}

void xrit_ring_destroy(XritRing *r) {
    if (!r) return;
    delete[] r->data;
    delete r;
}

size_t xrit_ring_size(XritRing *r) {
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_acquire);
}

size_t xrit_ring_capacity(XritRing *r) { return r->capacity; }
uint64_t xrit_ring_overflows(XritRing *r) { return r->overflows.load(); }

void xrit_ring_close(XritRing *r) {
    r->closed = true;
    std::lock_guard<std::mutex> lk(r->m);
    r->cv_data.notify_all();
    r->cv_space.notify_all();
}

// push n floats; blocking=0 drops (returns 0) when full, blocking=1 waits.
// Returns n on success.
size_t xrit_ring_push(XritRing *r, const float *src, size_t n, int blocking) {
    if (n > r->capacity) return 0;
    for (;;) {
        size_t used = xrit_ring_size(r);
        if (r->capacity - used >= n) break;
        if (!blocking) {
            r->overflows++;
            return 0;
        }
        if (r->closed) return 0;
        std::unique_lock<std::mutex> lk(r->m);
        r->cv_space.wait_for(lk, std::chrono::milliseconds(50));
    }
    size_t head = r->head.load(std::memory_order_relaxed);
    size_t idx = head & r->mask;
    size_t first = std::min(n, r->capacity - idx);
    std::memcpy(r->data + idx, src, first * sizeof(float));
    if (n > first) std::memcpy(r->data, src + first, (n - first) * sizeof(float));
    r->head.store(head + n, std::memory_order_release);
    {
        std::lock_guard<std::mutex> lk(r->m);
        r->cv_data.notify_one();
    }
    return n;
}

// pop exactly n floats; waits up to timeout_ms (-1 = forever).
// Returns n, or 0 on timeout/close.
size_t xrit_ring_pop(XritRing *r, float *dst, size_t n, long timeout_ms) {
    auto deadline = std::chrono::steady_clock::now() +
                    std::chrono::milliseconds(timeout_ms < 0 ? 0 : timeout_ms);
    while (xrit_ring_size(r) < n) {
        if (r->closed) return 0;
        std::unique_lock<std::mutex> lk(r->m);
        if (timeout_ms < 0) {
            r->cv_data.wait_for(lk, std::chrono::milliseconds(100));
        } else {
            if (std::chrono::steady_clock::now() >= deadline) return 0;
            r->cv_data.wait_until(lk, deadline);
        }
    }
    size_t tail = r->tail.load(std::memory_order_relaxed);
    size_t idx = tail & r->mask;
    size_t first = std::min(n, r->capacity - idx);
    std::memcpy(dst, r->data + idx, first * sizeof(float));
    if (n > first) std::memcpy(dst + first, r->data, (n - first) * sizeof(float));
    r->tail.store(tail + n, std::memory_order_release);
    {
        std::lock_guard<std::mutex> lk(r->m);
        r->cv_space.notify_one();
    }
    return n;
}

// ---------------------------------------------------------------------------
// Sample normalization (frontend ingest paths)
// ---------------------------------------------------------------------------

// u8 IQ -> float, (x - 128) / 128  (SpyServer/RTLSDR convention)
void xrit_u8_to_f32(const uint8_t *src, float *dst, size_t n) {
    for (size_t i = 0; i < n; i++) dst[i] = (float(src[i]) - 128.0f) / 128.0f;
}

// s16 IQ -> float, x / 32768
void xrit_s16_to_f32(const int16_t *src, float *dst, size_t n) {
    for (size_t i = 0; i < n; i++) dst[i] = float(src[i]) / 32768.0f;
}

// float soft symbols -> int8 wire: clamp(x*127) (SymbolManager.cpp:43-46)
void xrit_quantize_symbols(const float *src, int8_t *dst, size_t n) {
    for (size_t i = 0; i < n; i++) {
        float v = src[i] * 127.0f;
        if (v > 127.0f) v = 127.0f;
        if (v < -128.0f) v = -128.0f;
        dst[i] = (int8_t)v;
    }
}

// deinterleave IQ floats -> separate re/im arrays (demod block ingest)
void xrit_deinterleave(const float *src, float *re, float *im, size_t npairs) {
    for (size_t i = 0; i < npairs; i++) {
        re[i] = src[2 * i];
        im[i] = src[2 * i + 1];
    }
}

// ---------------------------------------------------------------------------
// TCP helpers (SatHelper TcpClient/TcpServer equivalents)
// ---------------------------------------------------------------------------

int xrit_tcp_connect(const char *host, int port, int timeout_ms) {
    int fd = socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -1;
    struct timeval tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    setsockopt(fd, SOL_SOCKET, SO_SNDTIMEO, &tv, sizeof(tv));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(port);
    if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
        close(fd);
        return -1;
    }
    if (connect(fd, (sockaddr *)&addr, sizeof(addr)) != 0) {
        close(fd);
        return -1;
    }
    int one = 1;
    setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    return fd;
}

int xrit_tcp_listen(int port) {
    int fd = socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -1;
    int one = 1;
    setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(port);
    addr.sin_addr.s_addr = INADDR_ANY;
    if (bind(fd, (sockaddr *)&addr, sizeof(addr)) != 0 || listen(fd, 4) != 0) {
        close(fd);
        return -1;
    }
    return fd;
}

int xrit_tcp_accept(int server_fd, int timeout_ms) {
    struct timeval tv{timeout_ms / 1000, (timeout_ms % 1000) * 1000};
    setsockopt(server_fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));
    return accept(server_fd, nullptr, nullptr);
}

long xrit_tcp_send_all(int fd, const void *buf, size_t n) {
    size_t sent = 0;
    while (sent < n) {
        ssize_t k = send(fd, (const char *)buf + sent, n - sent, MSG_NOSIGNAL);
        if (k <= 0) return -1;
        sent += (size_t)k;
    }
    return (long)sent;
}

long xrit_tcp_recv(int fd, void *buf, size_t n) {
    ssize_t k = recv(fd, buf, n, 0);
    return (long)k;
}

// receive exactly n bytes (SatHelper WaitForData+Receive semantics)
long xrit_tcp_recv_all(int fd, void *buf, size_t n) {
    size_t got = 0;
    while (got < n) {
        ssize_t k = recv(fd, (char *)buf + got, n - got, 0);
        if (k <= 0) return (long)got > 0 ? (long)got : -1;
        got += (size_t)k;
    }
    return (long)got;
}

void xrit_tcp_close(int fd) { close(fd); }

int xrit_io_abi_version(void) { return 1; }

}  // extern "C"
