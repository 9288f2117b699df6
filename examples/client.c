/* Minimal C client for the streamz-tpu serving daemon (`--serve`).
 *
 * Demonstrates that the wire protocol (streamz_tpu/app/server.py, module
 * docstring) is trivially speakable without Python: length-prefixed
 * frames, little-endian integers, one TCP connection per stream.
 *
 *   frame  := opcode:u8 length:u32 payload[length]
 *   FEED   (0x01): payload = wire:u8 + samples   (wire 1 = int16 LE PCM)
 *   FINALIZE (0x03) -> VERDICT (0x81): speaker:i32 confidence:f32 final:u8
 *   ERROR  (0x7f): utf-8 message instead of a verdict
 *
 * Usage:  client HOST PORT < pcm_i16le_44100hz.raw
 * Prints "speaker <id> confidence <c>" or "none"; exits non-zero on
 * protocol or server errors.  Compiled and exercised against a live
 * server by tests/test_server.py::test_c_client_end_to_end.
 */
#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <unistd.h>

#define OP_FEED 0x01
#define OP_FINALIZE 0x03
#define OP_VERDICT 0x81
#define OP_ERROR 0x7f
#define WIRE_I16 1
#define CHUNK_SAMPLES 8192

static int send_all(int fd, const void *buf, size_t n) {
  const char *p = (const char *)buf;
  while (n) {
    ssize_t k = write(fd, p, n);
    if (k <= 0) return -1;
    p += k;
    n -= (size_t)k;
  }
  return 0;
}

static int recv_all(int fd, void *buf, size_t n) {
  char *p = (char *)buf;
  while (n) {
    ssize_t k = read(fd, p, n);
    if (k <= 0) return -1;
    p += k;
    n -= (size_t)k;
  }
  return 0;
}

static int send_frame(int fd, uint8_t op, const void *payload, uint32_t len) {
  unsigned char hdr[5];
  hdr[0] = op;
  memcpy(hdr + 1, &len, 4); /* little-endian host assumed (x86/arm LE) */
  if (send_all(fd, hdr, 5)) return -1;
  return len ? send_all(fd, payload, len) : 0;
}

int main(int argc, char **argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s HOST PORT < pcm_i16le.raw\n", argv[0]);
    return 2;
  }
  int fd = socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) {
    perror("socket");
    return 1;
  }
  struct sockaddr_in addr;
  memset(&addr, 0, sizeof(addr));
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)atoi(argv[2]));
  if (inet_pton(AF_INET, argv[1], &addr.sin_addr) != 1) {
    fprintf(stderr, "bad host %s\n", argv[1]);
    return 2;
  }
  if (connect(fd, (struct sockaddr *)&addr, sizeof(addr))) {
    perror("connect");
    return 1;
  }
  int one = 1;
  setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));

  /* FEED stdin PCM in chunks: payload = wire tag byte + raw i16 bytes. */
  static unsigned char payload[1 + CHUNK_SAMPLES * 2];
  payload[0] = WIRE_I16;
  size_t got;
  while ((got = fread(payload + 1, 1, CHUNK_SAMPLES * 2, stdin)) > 0) {
    if (got % 2) got -= 1; /* never split a sample */
    if (!got) break;
    if (send_frame(fd, OP_FEED, payload, (uint32_t)(1 + got))) {
      fprintf(stderr, "feed failed\n");
      return 1;
    }
  }

  if (send_frame(fd, OP_FINALIZE, NULL, 0)) {
    fprintf(stderr, "finalize send failed\n");
    return 1;
  }
  unsigned char hdr[5];
  if (recv_all(fd, hdr, 5)) {
    fprintf(stderr, "reply header failed\n");
    return 1;
  }
  uint32_t len;
  memcpy(&len, hdr + 1, 4);
  if (hdr[0] == OP_ERROR) {
    char *msg = (char *)malloc(len + 1);
    if (!msg || recv_all(fd, msg, len)) return 1;
    msg[len] = 0;
    fprintf(stderr, "server error: %s\n", msg);
    return 1;
  }
  if (hdr[0] != OP_VERDICT || len != 9) {
    fprintf(stderr, "unexpected reply op 0x%02x len %u\n", hdr[0], len);
    return 1;
  }
  unsigned char body[9];
  if (recv_all(fd, body, 9)) return 1;
  int32_t speaker;
  float conf;
  memcpy(&speaker, body, 4);
  memcpy(&conf, body + 4, 4);
  if (speaker < 0)
    printf("none\n");
  else
    printf("speaker %d confidence %.6f\n", speaker, conf);
  close(fd);
  return 0;
}
