// Standalone assert-based unit tests for the native runtime core —
// the analog of the reference's test/core/*.cpp binaries
// (test_device_allocator.cpp, test_intrusive_ptr.cpp style: no framework,
// plain asserts, built as a .out executable and run in CI).
//
// Build & run:  make -C kfunca_tpu/csrc test

#include <cassert>
#include <cstdint>
#include <cstdio>
#include <vector>

extern "C" {
int64_t kf_allocate(int device, int64_t nbytes, int64_t *out_size, int *out_reused);
int kf_free(int64_t block_id);
int64_t kf_block_addr(int64_t block_id);
void kf_alloc_stats(int64_t *out5);
void kf_alloc_reset();
int8_t kf_promote(int8_t a, int8_t b);
int8_t kf_accumulate_type(int8_t t);
int kf_broadcast_shapes(int ntensors, const int64_t *ndims, const int64_t *shapes_flat,
                        int64_t *out_ndim, int64_t *out_shape);
int kf_plan_loop_nest(int ntensors, int64_t ndim, const int64_t *shape,
                      const int64_t *strides_flat, int64_t *out_shape,
                      int64_t *out_strides_flat, int64_t *out_perm,
                      int64_t *out_group_sizes);
int kf_tape_schedule(int64_t n_nodes, int64_t n_edges, const int64_t *edge_src,
                     const int64_t *edge_dst, int64_t root, int64_t *out_order);
int64_t kf_page_pool_create(int64_t n_pages);
int64_t kf_page_alloc(int64_t pool_id, int64_t count, int64_t *out_pages);
int64_t kf_page_free(int64_t pool_id, int64_t count, const int64_t *pages);
int64_t kf_page_pool_available(int64_t pool_id);
int64_t kf_queue_create();
int64_t kf_queue_push(int64_t queue_id, int64_t item);
int64_t kf_queue_pop(int64_t queue_id);
int64_t kf_queue_size(int64_t queue_id);
}

static void test_allocator() {
    kf_alloc_reset();
    int64_t size;
    int reused;
    int64_t b1 = kf_allocate(0, 100, &size, &reused);
    assert(size == 1024 && reused == 0);           // 1KB alignment
    int64_t b2 = kf_allocate(0, 5000, &size, &reused);
    assert(size == 5120 && reused == 0);
    assert(kf_block_addr(b1) != kf_block_addr(b2)); // disjoint windows
    assert(kf_free(b1) == 0);
    assert(kf_free(b1) == -1);                      // double free rejected
    int64_t b3 = kf_allocate(0, 900, &size, &reused);
    assert(b3 == b1 && reused == 1);                // best-fit pool reuse
    // best fit picks the smallest adequate block
    assert(kf_free(b2) == 0);
    assert(kf_free(b3) == 0);
    // 4500 rounds to 5120 -> same size class as b2; 4000 would round to 4096
    // which lives in the smaller pool and must NOT steal b2 (class isolation)
    int64_t b4 = kf_allocate(0, 4500, &size, &reused);
    assert(b4 == b2 && reused == 1);
    int64_t stats[5];
    kf_alloc_stats(stats);
    assert(stats[2] == 1); // one live block
    assert(stats[4] == 2); // two reuses
    printf("test_allocator OK\n");
}

static void test_promotion() {
    // enum: Bool0 Byte1 Char2 Short3 Int4 Long5 Half6 BF16 7 Float8 Double9
    assert(kf_promote(4, 8) == 8);  // int + float -> float
    assert(kf_promote(6, 7) == 7);  // half + bf16 -> bf16 (wider enum)
    assert(kf_promote(1, 2) == 2);  // byte + char -> char (signed wins)
    assert(kf_promote(3, 5) == 5);  // short + long -> long
    assert(kf_promote(9, 6) == 9);  // double + half -> double
    assert(kf_accumulate_type(6) == 8); // half accumulates in float
    assert(kf_accumulate_type(4) == 5); // int accumulates in int64
    printf("test_promotion OK\n");
}

static void test_broadcast() {
    int64_t ndims[2] = {2, 2};
    int64_t shapes[4] = {16, 1, 1, 6};
    int64_t out_ndim, out_shape[12];
    assert(kf_broadcast_shapes(2, ndims, shapes, &out_ndim, out_shape) == 0);
    assert(out_ndim == 2 && out_shape[0] == 16 && out_shape[1] == 6);
    int64_t bad[4] = {3, 4, 2, 4};
    assert(kf_broadcast_shapes(2, ndims, bad, &out_ndim, out_shape) == -1);
    printf("test_broadcast OK\n");
}

static void test_loop_nest() {
    // contiguous pair collapses to one flat loop
    int64_t shape[3] = {4, 5, 6};
    int64_t strides[6] = {30, 6, 1, 30, 6, 1};
    int64_t out_shape[3], out_strides[6];
    int64_t perm[3], gsz[3];
    int nd = kf_plan_loop_nest(2, 3, shape, strides, out_shape, out_strides, perm, gsz);
    assert(perm[0] == 0 && perm[1] == 1 && perm[2] == 2 && gsz[0] == 3);
    assert(nd == 1 && out_shape[0] == 120 && out_strides[0] == 1 && out_strides[1] == 1);
    // transposed single operand reorders then collapses
    int64_t shape2[2] = {6, 4};
    int64_t strides2[2] = {1, 6};
    nd = kf_plan_loop_nest(1, 2, shape2, strides2, out_shape, out_strides, perm, gsz);
    assert(perm[0] == 1 && perm[1] == 0 && gsz[0] == 2);
    assert(nd == 1 && out_shape[0] == 24 && out_strides[0] == 1);
    printf("test_loop_nest OK\n");
}

static void test_tape() {
    // multi-use node must be scheduled after both consumers
    int64_t src[4] = {0, 0, 1, 2};
    int64_t dst[4] = {1, 2, 3, 3};
    int64_t order[4];
    int n = kf_tape_schedule(4, 4, src, dst, 0, order);
    assert(n == 4 && order[0] == 0 && order[3] == 3);
    printf("test_tape OK\n");
}

static void test_serving() {
    // page allocator: bounded, recycling, atomic failure
    int64_t pool = kf_page_pool_create(8);
    int64_t pages[8];
    assert(kf_page_alloc(pool, 5, pages) == 5);
    assert(kf_page_pool_available(pool) == 3);
    int64_t more[4];
    assert(kf_page_alloc(pool, 4, more) == -1);  // can't satisfy: nothing taken
    assert(kf_page_pool_available(pool) == 3);
    assert(kf_page_free(pool, 5, pages) == 5);
    assert(kf_page_pool_available(pool) == 8);
    assert(kf_page_alloc(pool, 8, pages) == 8);
    for (int i = 0; i < 8; i++)
        for (int j = i + 1; j < 8; j++) assert(pages[i] != pages[j]);

    // FIFO request queue
    int64_t q = kf_queue_create();
    assert(kf_queue_pop(q) == -1);
    kf_queue_push(q, 7);
    kf_queue_push(q, 8);
    kf_queue_push(q, 9);
    assert(kf_queue_size(q) == 3);
    assert(kf_queue_pop(q) == 7 && kf_queue_pop(q) == 8 && kf_queue_pop(q) == 9);
    assert(kf_queue_pop(q) == -1);
    printf("test_serving OK\n");
}

int main() {
    test_allocator();
    test_promotion();
    test_broadcast();
    test_loop_nest();
    test_tape();
    test_serving();
    printf("all native core tests passed\n");
    return 0;
}
